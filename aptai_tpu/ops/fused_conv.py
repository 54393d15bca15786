"""Fused strided Conv1d + LayerNorm + GELU Pallas kernel.

The wav2vec2 feature extractor applies [conv → LayerNorm → GELU] seven times
(reference models via HF; our models/wav2vec2.py::ConvLayerBlock).  XLA runs
these as separate conv + norm + gelu HLOs with HBM round-trips between them;
this kernel streams overlapping input tiles from HBM into VMEM by explicit
async DMA (tile spans overlap by ``k − stride`` rows, which blocked
BlockSpec indexing cannot express), computes the strided conv as
``Σ_j x[j::stride] @ W[j]`` (k matmuls on the MXU), then the row LayerNorm
and exact GELU on the VPU — one HBM read + one HBM write per activation.

Double buffering (round-2): each grid cell processes TWO output tiles with
two *static* scratch slots — both DMAs are started up front, so tile B's
HBM fetch overlaps tile A's compute.  Round 1 measured a dynamically
indexed scratch-slot variant at 20× slower (dynamic slot indexing defeats
Mosaic's pipelining, benchmarks/PERF.md); the static two-slot unroll is the
fix that note prescribes.

Scope: the homogeneous mid-stack layers (stride 2, kernel 2 or 3, wide
channels — layers 2–7 of the standard config); the first layer (k=10, s=5,
C_in=1) is left to XLA (~2% of FE FLOPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # output rows per tile (2 tiles per grid cell)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7): Mosaic
    has no erf/erfc lowering, and 1.5e-7 is far below bf16 resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _conv_ln_gelu_tile(x, w_ref, b_ref, ls_ref, lb_ref, *, kernel, eps,
                       use_bias, out_shape, out_dtype):
    """Compute one (TILE, Cout) output tile from a (span, Cin) input tile."""
    c = x.shape[-1]
    # Mosaic supports neither strided value slices nor strided DMA, so the
    # stride-2 phases come from a (2·TILE, C) → (TILE, 2, C) reshape +
    # unit-stride slices; the k=3 tap reuses phase 0 shifted by one row.
    base = x[: 2 * TILE].reshape(TILE, 2, c)

    def tap(j):
        if j < 2:
            return base[:, j, :]
        return jnp.concatenate(
            [base[1:, j - 2, :], x[2 * TILE + (j - 2)][None]], axis=0
        )

    acc = jnp.zeros(out_shape, jnp.float32)
    for j in range(kernel):
        acc += jax.lax.dot_general(
            tap(j).astype(jnp.float32), w_ref[j].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if use_bias:
        acc = acc + b_ref[:].astype(jnp.float32)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean((acc - mean) ** 2, axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[:].astype(jnp.float32) + lb_ref[:].astype(jnp.float32)
    # exact-form GELU 0.5·y·(1+erf(y/√2)) with the polynomial erf above
    gelu = 0.5 * y * (1.0 + _erf(y * (2.0 ** -0.5)))
    return gelu.astype(out_dtype)


def _kernel(x_hbm, w_ref, b_ref, ls_ref, lb_ref, o_ref, scratch0, scratch1,
            sem0, sem1, *, kernel, stride, eps, use_bias, span):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    start0 = (2 * ti) * TILE * stride
    start1 = start0 + TILE * stride
    # start BOTH fetches before any compute: slot 1's DMA rides under
    # slot 0's matmuls (static slots — no dynamic indexing, Mosaic keeps
    # its pipeline)
    dma0 = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(start0, span), :], scratch0, sem0
    )
    dma1 = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(start1, span), :], scratch1, sem1
    )
    dma0.start()
    dma1.start()

    half = (TILE, o_ref.shape[-1])
    dma0.wait()
    o_ref[:TILE] = _conv_ln_gelu_tile(
        scratch0[:], w_ref, b_ref, ls_ref, lb_ref, kernel=kernel, eps=eps,
        use_bias=use_bias, out_shape=half, out_dtype=o_ref.dtype,
    )
    dma1.wait()
    o_ref[TILE:] = _conv_ln_gelu_tile(
        scratch1[:], w_ref, b_ref, ls_ref, lb_ref, kernel=kernel, eps=eps,
        use_bias=use_bias, out_shape=half, out_dtype=o_ref.dtype,
    )


def fused_conv_ln_gelu(
    x: jnp.ndarray,        # (B, L, C)
    w: jnp.ndarray,        # (k, C, Cout)
    b,                     # (Cout,) or None
    ln_scale: jnp.ndarray,  # (Cout,)
    ln_bias: jnp.ndarray,   # (Cout,)
    stride: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns GELU(LN(conv_valid(x))) of shape (B, T_out, Cout)."""
    batch, length, c_in = x.shape
    k, _, c_out = w.shape
    t_out = (length - k) // stride + 1
    n_cells = -(-t_out // (2 * TILE))
    t_pad = n_cells * 2 * TILE
    span = TILE * stride + (k - stride)
    span = -(-span // 8) * 8  # DMA slices must be sublane (8) aligned
    # the second slot of the last cell reads up to start1 + span
    need = (2 * n_cells - 1) * TILE * stride + span
    if length < need:
        x = jnp.pad(x, ((0, 0), (0, need - length), (0, 0)))

    use_bias = b is not None
    if b is None:
        b = jnp.zeros((c_out,), x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, kernel=k, stride=stride, eps=eps,
                          use_bias=use_bias, span=span),
        grid=(batch, n_cells),
        in_specs=[
            # whole array stays in HBM (ANY-space blocks must be trivial);
            # the kernel DMAs its (batch, span) slices explicitly
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 2 * TILE, c_out),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, t_pad, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((span, c_in), x.dtype),
            pltpu.VMEM((span, c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, w, b, ln_scale, ln_bias)
    return out[:, :t_out]
