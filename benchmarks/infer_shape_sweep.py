"""Inference shape sweep: audio-s/s/chip of the flagship predict forward
across batch/duration shapes.

bench.py's headline runs batch 32 x 10 s.  The training sweep found +16%
at a larger per-chip batch (PERF.md "Training batch sweep"); this probes
whether the inference headline also has batch headroom now that the
stack pads once and sits at its GEMM roofline.  Methodology identical to
bench.py: chained scalar through iterations, ONE value fetch per timed
leg (the axon tunnel executes lazily; per-iteration fetches add ~30 ms
RTT each).

Usage:  python benchmarks/infer_shape_sweep.py [--shapes 32x10,64x10,96x10]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="32x10,48x10,64x10,96x10",
                   help="comma list of BATCHxSECONDS")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--warmup", type=int, default=2)
    args = p.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.models import APTAI, Wav2Vec2Config

    backend = jax.default_backend()
    cfg = Wav2Vec2Config(dtype="bfloat16" if backend == "tpu" else "float32")
    model = APTAI(cfg, num_phonemes=46)

    @jax.jit
    def forward(params, audio, lengths, chain):
        out = model.apply({"params": params}, audio + 0.0 * chain, lengths,
                          method="predict")
        return (jnp.sum(out["tvs_pred"])
                + jnp.sum(out["phn_fc_pred"].astype(jnp.float32)))

    params = None
    rng = np.random.default_rng(0)
    for spec in args.shapes.split(","):
        batch, seconds = (int(x) for x in spec.strip().split("x"))
        samples = 16_000 * seconds
        audio = jnp.asarray(
            rng.standard_normal((batch, samples)).astype(np.float32) * 0.1)
        lengths = jnp.asarray(np.full((batch,), samples, np.int32))
        if params is None:
            variables = model.init(jax.random.PRNGKey(0), audio, lengths,
                                   method="predict")
            params = variables["params"]

        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(args.warmup):
            s = forward(params, audio, lengths, s)
        _ = float(s)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        s = jnp.float32(0.0)
        for _ in range(args.iters):
            s = forward(params, audio, lengths, s)
        _ = float(s)
        dt = time.perf_counter() - t0
        total = batch * seconds * args.iters
        print(f"{batch:>3} x {seconds:>3}s: {total / dt:8.1f} audio-s/s  "
              f"({1e3 * dt / args.iters:7.1f} ms/dispatch, "
              f"warm+compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
