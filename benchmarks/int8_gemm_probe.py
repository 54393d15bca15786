"""Is W8A8 int8 worth it at the encoder's GEMM shapes?

The raw-square probe (mxu_dtype_probe.py) measured int8 at 195 vs bf16's
124 TFLOPS at n=8192 (+58%).  This probes the ACTUAL encoder GEMM shapes
(M=B*T=16384; proj 1024x1024, FFN 1024x4096 / 4096x1024) three ways:

  1. bf16 chain (production today; the yardstick)
  2. int8 pure chain (pre-quantized weights AND activations; upper bound)
  3. int8 with per-row dynamic activation quantization + f32 dequant
     epilogue (the realistic W8A8 production path)

Each timing chains L=24 GEMMs inside ONE jit (composed-stack methodology:
isolated ops carry ~1.3 ms dispatch overhead each on the axon tunnel).

    python benchmarks/int8_gemm_probe.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

L = 24  # chained GEMMs per jit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--m", type=int, default=16384)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    m = args.m
    rng = np.random.default_rng(0)
    results = {"m": m, "L": L, "backend": jax.default_backend()}

    def timed(fn, x0):
        f = jax.jit(fn)
        x = f(x0)
        x = f(x)
        float(jnp.sum(x.astype(jnp.float32)))
        t0 = time.perf_counter()
        y = x
        for _ in range(args.iters):
            y = f(y)
        float(jnp.sum(y.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters

    def dot(a, b, acc):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc)

    for k, n in ((1024, 1024), (1024, 4096), (4096, 1024)):
        tag = f"{k}x{n}"
        flops = 2.0 * m * k * n * L

        # weights: one per direction so the chain alternates back to shape
        # (m, k) — for square K==N a single weight suffices
        w_f = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        wb_f = rng.standard_normal((n, k)).astype(np.float32) * 0.02
        w16, wb16 = jnp.asarray(w_f, jnp.bfloat16), jnp.asarray(wb_f, jnp.bfloat16)
        x16 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

        def bf16_chain(x, w16=w16, wb16=wb16):
            for i in range(L):
                w = w16 if i % 2 == 0 else wb16
                x = dot(x, w, jnp.float32).astype(jnp.bfloat16)
            return x

        dt = timed(bf16_chain, x16)
        results[f"bf16_{tag}_ms"] = 1e3 * dt
        results[f"bf16_{tag}_tflops"] = flops / dt / 1e12

        # pure int8: weights + activations already int8, int32 accum, and a
        # cheap mask keeps the chained activation in int8 range
        w8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        wb8 = jnp.asarray(rng.integers(-127, 127, (n, k)), jnp.int8)
        x8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)

        def int8_chain(x, w8=w8, wb8=wb8):
            for i in range(L):
                w = w8 if i % 2 == 0 else wb8
                x = (dot(x, w, jnp.int32) & 127).astype(jnp.int8)
            return x

        try:
            dt = timed(int8_chain, x8)
            results[f"int8_{tag}_ms"] = 1e3 * dt
            results[f"int8_{tag}_tflops"] = flops / dt / 1e12
        except Exception as e:  # pragma: no cover
            results[f"int8_{tag}_error"] = f"{type(e).__name__}"[:80]

        # realistic W8A8: bf16 activation in, per-row max-abs dynamic scale,
        # int8 GEMM, f32 dequant (row scale x per-channel weight scale)
        ws = jnp.asarray(np.abs(w_f).max(0) / 127.0, jnp.float32)   # (n,)
        wbs = jnp.asarray(np.abs(wb_f).max(0) / 127.0, jnp.float32)

        def w8a8_chain(x, w8=w8, wb8=wb8, ws=ws, wbs=wbs):
            for i in range(L):
                w, s = (w8, ws) if i % 2 == 0 else (wb8, wbs)
                xs = jnp.max(jnp.abs(x).astype(jnp.float32), axis=1,
                             keepdims=True) / 127.0              # (m, 1)
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                              -127, 127).astype(jnp.int8)
                y = dot(xq, w, jnp.int32)
                x = (y.astype(jnp.float32) * xs * s).astype(jnp.bfloat16)
            return x

        try:
            dt = timed(w8a8_chain, x16)
            results[f"w8a8_{tag}_ms"] = 1e3 * dt
            results[f"w8a8_{tag}_tflops"] = flops / dt / 1e12
        except Exception as e:  # pragma: no cover
            results[f"w8a8_{tag}_error"] = f"{type(e).__name__}"[:80]

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
