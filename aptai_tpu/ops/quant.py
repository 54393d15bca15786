"""Dynamic W8A8 int8 quantization for inference GEMMs.

Why: this chip's MXU runs int8×int8→int32 at ~1.6× its bf16 rate at the
encoder's GEMM shapes, and the advantage survives realistic per-call
quantization overhead (measured, benchmarks/int8_gemm_probe.py: FFN GEMMs
19.9 → 15.0 ms / 24 layers, projections 6.8 → 6.1 ms).  The encoder stack
is otherwise AT its bf16 GEMM roofline (benchmarks/PERF.md round 3), so a
faster GEMM dtype is the only remaining lever on the stack.

Scheme (standard dynamic W8A8):
  * activations: per-row (last contracted axis group) max-abs scale,
    computed on the fly — no calibration pass, robust to sequence-level
    outliers because every row gets its own scale;
  * weights: per-output-channel max-abs scale, quantized on the fly per
    forward (weights are ≥16× smaller than the (B·T, K) activation matrix,
    so the extra pass is noise — and params stay full-precision, keeping
    checkpoints/conversion untouched);
  * accumulation in int32 on the MXU, dequantized in f32 by
    ``row_scale × channel_scale``, cast back to the compute dtype.

INFERENCE ONLY: ``jnp.round`` has zero gradient, so a quantized forward
does not train.  Enable via ``Wav2Vec2Config.quant`` for serving
predictors; trainers keep the default ``"none"``.

The reference has no quantized path (eager fp32 torch throughout,
reference models/w2v2_pr.py:40-88); this is TPU-native new scope, opt-in
and default-off because it is an output-changing approximation (deviation
bounds pinned in tests/test_quant.py, measured end-to-end in
benchmarks/PERF.md).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_QMAX = 127.0


def dynamic_quantize(x: jnp.ndarray, axes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ``x`` to int8 with one max-abs scale per slice over ``axes``
    (the contracted axes).  Returns ``(q int8, scale f32 with kept dims)``
    such that ``q * scale ≈ x``."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / _QMAX
    scale = jnp.maximum(scale, 1e-30)  # all-zero slices stay zero, not NaN
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def w8a8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """``x @ w`` over the last axis of ``x`` / first of ``w`` in int8.

    ``x``: (..., K) activations (any float dtype); ``w``: (K, N) weights.
    Per-row activation scales, per-column weight scales, int32 MXU
    accumulation, f32 dequant.  Bias (if any) is the caller's to add — it
    stays full-precision."""
    xq, xs = dynamic_quantize(x, axes=-1)
    wq, ws = dynamic_quantize(w, axes=0)
    y = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * xs * ws).astype(out_dtype or x.dtype)


def w8a8_head_proj(x: jnp.ndarray, k: jnp.ndarray,
                   out_dtype=None) -> jnp.ndarray:
    """Quantized ``einsum('btc,chd->bhtd', x, k)`` — the attention head
    projection straight into the kernel layout (models/wav2vec2.py
    HeadProjBHTD).  The int8 GEMM keeps the same fused output transpose as
    the bf16 einsum."""
    xq, xs = dynamic_quantize(x, axes=-1)          # (B,T,C), (B,T,1)
    kq, ks = dynamic_quantize(k, axes=0)           # (C,H,D), (1,H,D)
    y = jnp.einsum("btc,chd->bhtd", xq, kq,
                   preferred_element_type=jnp.int32)
    scale = xs[:, None, :, :] * ks[:, :, None, :]  # (B,1,T,1)·(1,H,1,D)
    return (y.astype(jnp.float32) * scale).astype(out_dtype or x.dtype)


def w8a8_out_proj(ctx: jnp.ndarray, k: jnp.ndarray,
                  out_dtype=None) -> jnp.ndarray:
    """Quantized ``einsum('bhtd,hdc->btc', ctx, k)`` — the attention output
    projection consuming (B, H, T, D) directly (OutProjBHTD)."""
    # contracted axes: (h, d) jointly per (b, t) row / per output channel c
    cq, cs = dynamic_quantize(ctx, axes=(1, 3))    # (B,H,T,D), (B,1,T,1)
    kq, ks = dynamic_quantize(k, axes=(0, 1))      # (H,D,C), (1,1,C)
    y = jnp.einsum("bhtd,hdc->btc", cq, kq,
                   preferred_element_type=jnp.int32)
    scale = cs[:, 0] * ks[0]                       # (B,T,1)·(1,C) → (B,T,C)
    return (y.astype(jnp.float32) * scale).astype(out_dtype or ctx.dtype)
