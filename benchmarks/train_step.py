"""APTAI training-step throughput on one chip (secondary benchmark).

Measures the full jitted train step (forward + backward with per-layer
rematerialization + Adam) for the full-size backbone at the blessed batch
size and a larger throughput batch.  Prints one JSON line per config.
Methodology matches bench.py: chained scalar dependency, single fetch.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma list of BxS (batch x seconds), e.g. "
                         "'8x5,32x5'; default: blessed shape only")
    ap.add_argument("--dtype", default=None,
                    help="compute dtype override (default: bfloat16 on "
                         "TPU, float32 on CPU — what the trainer's "
                         "dtype='auto' resolves to)")
    ap.add_argument("--rng_impl", default="rbg",
                    help="PRNG for dropout/SpecAugment masks; 'rbg' is the "
                         "trainer default (train/config.py), 'threefry' "
                         "restores jax's default")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    import jax.numpy as jnp

    from aptai_tpu.models import APTAI, Wav2Vec2Config
    from aptai_tpu.train import create_train_state, make_train_step, torch_adam

    backend = jax.default_backend()
    cfg = Wav2Vec2Config(dtype=args.dtype or (
        "bfloat16" if backend == "tpu" else "float32"))
    model = APTAI(cfg, num_phonemes=46)
    configs = [(8, 5)] if backend == "tpu" else [(2, 1)]
    if args.configs:
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in args.configs.split(",")]

    for batch, seconds in configs:
        samples = 16_000 * seconds
        t = int(cfg.feat_extract_output_lengths(np.asarray(samples)))
        rng = np.random.default_rng(0)
        batch_data = {
            "audio": jnp.asarray(
                (rng.standard_normal((batch, samples)) * 0.1).astype(np.float32)),
            "audio_lengths": jnp.asarray(np.full(batch, samples, np.int32)),
            "phn_frames": jnp.asarray(
                rng.integers(1, 46, (batch, t)).astype(np.int32)),
            "tv_targets": jnp.asarray(
                rng.standard_normal((batch, t, 9)).astype(np.float32)),
        }
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(
                lambda k: model.init(
                    k, jnp.zeros((1, samples), jnp.float32),
                    jnp.full((1,), samples, jnp.int32),
                    jnp.zeros((1, t), jnp.int32), jnp.zeros((1, t, 9)),
                ), backend="cpu")(jax.random.PRNGKey(0))
        params = jax.device_put(variables["params"], jax.devices()[0])

        def loss_fn(p, b, rngs):
            out = model.apply(
                {"params": p}, b["audio"], b["audio_lengths"],
                b["phn_frames"], b["tv_targets"],
                deterministic=False, rngs=rngs,
            )
            return out["loss"], {}

        optimizer = torch_adam()
        state = create_train_state(params, optimizer)
        state = jax.device_put(state, jax.devices()[0])
        step = make_train_step(loss_fn, optimizer)

        key = jax.random.PRNGKey(1)
        # chained execution: the state threads the dependency naturally.
        # TWO warm steps: the second call re-traces + recompiles (the
        # updated state's XLA-chosen layouts differ from the device_put
        # originals — see benchmarks/PERF.md round 2); steady state begins
        # at call 3.
        for _ in range(2):
            state, m = step(state, batch_data, key, jnp.float32(1e-5))
            _ = float(m["loss"])  # compile + warm
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch_data, key, jnp.float32(1e-5))
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "metric": "aptai_train_step",
            "batch": batch,
            "dtype": cfg.dtype,
            "audio_seconds_per_item": seconds,
            "value": round(batch * seconds / dt, 2),
            "unit": "audio_sec/sec/chip",
            "ms_per_step": round(dt * 1000, 1),
        }))


if __name__ == "__main__":
    main()
