"""Probe the chip's matmul throughput per input dtype (bf16 / int8 / fp8).

Question: does a quantized GEMM path buy anything on THIS TPU generation?
The encoder stack already sits at its bf16 GEMM roofline (benchmarks/
PERF.md round 3), so the only way to go materially faster is a dtype with
higher MXU throughput.  This times a square GEMM (chained, one fetch —
bench.py methodology) per input dtype and prints effective TFLOPS.

    python benchmarks/mxu_dtype_probe.py [--n 4096] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    n, iters = args.n, args.iters
    rng = np.random.default_rng(0)
    a_f = rng.standard_normal((n, n)).astype(np.float32)
    b_f = rng.standard_normal((n, n)).astype(np.float32)
    flops = 2.0 * n * n * n
    results = {"n": n, "iters": iters, "backend": jax.default_backend()}

    def time_dot(a, b, acc_dtype, out_cast):
        """Chained a@b with the result folded back into `a` (keeps the
        loop sequential on device; one fetch at the end)."""

        @jax.jit
        def step(x):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            return out_cast(y)

        x = step(a)
        x = step(x)
        float(jnp.sum(x.astype(jnp.float32)))  # force warmup
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = step(y)
        float(jnp.sum(y.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    # bf16 × bf16 → f32 (the production path; the roofline yardstick)
    a16 = jnp.asarray(a_f, jnp.bfloat16)
    b16 = jnp.asarray(b_f, jnp.bfloat16)
    dt = time_dot(a16, b16, jnp.float32,
                  lambda y: (y * (1.0 / n)).astype(jnp.bfloat16))
    results["bf16_tflops"] = flops / dt / 1e12

    # int8 × int8 → int32 (quantized path candidate).  The chain keeps the
    # values in int8 by masking to a small range after each step.
    a8 = jnp.asarray(rng.integers(-16, 16, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-16, 16, (n, n)), jnp.int8)
    try:
        dt = time_dot(a8, b8, jnp.int32,
                      lambda y: (y & 15).astype(jnp.int8))
        results["int8_tflops"] = flops / dt / 1e12
    except Exception as e:  # pragma: no cover - hardware dependent
        results["int8_error"] = f"{type(e).__name__}: {e}"[:200]

    # fp8 (e4m3) × fp8 → f32, if this generation lowers it
    try:
        f8 = jnp.float8_e4m3fn
        a8f = jnp.asarray(a_f * 0.1, f8)
        b8f = jnp.asarray(b_f * 0.1, f8)
        dt = time_dot(a8f, b8f, jnp.float32, lambda y: (y * 0.01).astype(f8))
        results["fp8_e4m3_tflops"] = flops / dt / 1e12
    except Exception as e:  # pragma: no cover - hardware dependent
        results["fp8_error"] = f"{type(e).__name__}: {e}"[:200]

    for k, v in results.items():
        if isinstance(v, float):
            results[k] = round(v, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
