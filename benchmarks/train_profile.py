"""Per-piece APTAI train-step profile on one chip (chained execution).

Decomposes the full train step (benchmarks/train_step.py: 69.7 ms at the
blessed 8x5 shape, round-3 PERF.md) into its cost layers so the next
optimization target is measured, not guessed:

  fwd_loss        loss forward only (dropout + SpecAugment active)
  fwd_loss_det    loss forward, deterministic (isolates the stochastic tax)
  fwd_bwd         value_and_grad, every gradient leaf consumed
  adam_only       Adam moment update + param apply on fixed gradients
  full_step       the shipped donated train step (train/harness.py)

Deltas:  bwd = fwd_bwd - fwd_loss;  glue = full_step - fwd_bwd - adam_only.

    python benchmarks/train_profile.py [--configs 8x5,16x5] [--iters 10]

Methodology matches bench.py / encoder_profile.py: the axon tunnel executes
lazily and charges ~30 ms per value fetch, so every timing chains its
computation through the iterations and fetches ONE scalar at the end.
Non-donated params are initialized on-device (jitted init) so their layouts
match the executable's XLA-chosen ones (PERF.md round-3 methodology note).
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
    ap.add_argument("--configs", default="8x5")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip", default="",
                    help="comma list of variant labels to skip")
    ap.add_argument("--rng_impl", default=None,
                    help="jax_default_prng_impl override (e.g. 'rbg', "
                         "'unsafe_rbg') — measures the dropout/SpecAugment "
                         "mask-generation cost under a hardware-friendly "
                         "PRNG instead of threefry")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    if args.rng_impl:
        import jax as _jax

        _jax.config.update("jax_default_prng_impl", args.rng_impl)

    import jax
    import jax.numpy as jnp
    import optax

    from aptai_tpu.models import APTAI, Wav2Vec2Config
    from aptai_tpu.train import create_train_state, make_train_step, torch_adam

    backend = jax.default_backend()
    if backend == "tpu":
        cfg = Wav2Vec2Config(dtype="bfloat16")
    else:  # CPU smoke: tiny topology, same code paths
        cfg = Wav2Vec2Config(dtype="float32", hidden_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             intermediate_size=128, conv_dim=(32,) * 7)
    model = APTAI(cfg, num_phonemes=46)
    configs = [tuple(int(v) for v in c.split("x"))
               for c in args.configs.split(",")]
    if backend != "tpu":
        configs = [(2, 1)]

    for batch, seconds in configs:
        samples = 16_000 * seconds
        t = int(cfg.feat_extract_output_lengths(np.asarray(samples)))
        rng = np.random.default_rng(0)
        batch_data = {
            "audio": jnp.asarray((rng.standard_normal(
                (batch, samples)) * 0.1).astype(np.float32)),
            "audio_lengths": jnp.asarray(np.full(batch, samples, np.int32)),
            "phn_frames": jnp.asarray(
                rng.integers(1, 46, (batch, t)).astype(np.int32)),
            "tv_targets": jnp.asarray(
                rng.standard_normal((batch, t, 9)).astype(np.float32)),
        }

        def init_params(seed=0):
            # on-device init -> params carry XLA-chosen layouts, so the
            # non-donated variants do not re-marshal them per call.
            p = jax.jit(lambda k: model.init(
                k, jnp.zeros((1, samples), jnp.float32),
                jnp.full((1,), samples, jnp.int32),
                jnp.zeros((1, t), jnp.int32), jnp.zeros((1, t, 9)),
            )["params"])(jax.random.PRNGKey(seed))
            jax.block_until_ready(p)
            return p

        params = init_params()
        key = jax.random.PRNGKey(1)
        results = {"batch": batch, "seconds": seconds}

        def apply_loss(p, det, k):
            rngs = None if det else {
                "dropout": jax.random.fold_in(k, 1),
                "specaugment": jax.random.fold_in(k, 2),
            }
            out = model.apply(
                {"params": p}, batch_data["audio"],
                batch_data["audio_lengths"], batch_data["phn_frames"],
                batch_data["tv_targets"], deterministic=det, rngs=rngs,
            )
            return out["loss"]

        def chain_time(step, x0, fetch, label):
            """step(x, i) -> x'; chain through iters, fetch ONE scalar."""
            if label in skip:
                return
            x = step(x0, jnp.int32(0))
            x = step(x, jnp.int32(1))      # layout-stable second call
            _ = float(fetch(x))
            t0 = time.perf_counter()
            y = x
            for i in range(args.iters):
                y = step(y, jnp.int32(i + 2))
            _ = float(fetch(y))
            ms = 1e3 * (time.perf_counter() - t0) / args.iters
            results[label] = round(ms, 2)
            print(f"  {label}: {ms:.2f} ms", file=sys.stderr)

        # --- forward-only (stochastic + deterministic) ------------------
        @jax.jit
        def fwd_step(carry, i):
            p, acc = carry
            return (p, acc + apply_loss(p, False, jax.random.fold_in(key, i)))

        @jax.jit
        def fwd_det_step(carry, i):
            p, acc = carry
            # i folded into acc to keep iterations distinct dispatches
            return (p, acc + apply_loss(p, True, key) + 0 * i)

        fetch_acc = lambda c: c[1]
        chain_time(fwd_step, (params, jnp.float32(0.0)), fetch_acc,
                   "fwd_loss_ms")
        chain_time(fwd_det_step, (params, jnp.float32(0.0)), fetch_acc,
                   "fwd_loss_det_ms")

        # --- forward + backward (all grads consumed, not DCE-able) ------
        @jax.jit
        def fwd_bwd_step(carry, i):
            p, acc = carry
            loss, grads = jax.value_and_grad(
                lambda q: apply_loss(q, False, jax.random.fold_in(key, i))
            )(p)
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            # 1e-20 keeps a real data dependency on every gradient leaf
            # without perturbing the chained loss accumulator.
            return (p, acc + loss + 1e-20 * gsum)

        chain_time(fwd_bwd_step, (params, jnp.float32(0.0)), fetch_acc,
                   "fwd_bwd_ms")

        # --- Adam-only on fixed grads ------------------------------------
        optimizer = torch_adam()
        grads = jax.jit(lambda p: jax.tree.map(
            lambda x: 1e-6 * x.astype(jnp.float32), p))(params)
        jax.block_until_ready(grads)

        @jax.jit
        def adam_step_g(state, g, i):
            # grads passed as an argument: closing over the 1.26 GB tree
            # would embed it as jaxpr constants (compile-time blowup)
            updates, opt_state = optimizer.update(
                g, state.opt_state, state.params)
            lr = 1e-6 * (1.0 + 0.0 * i)
            updates = jax.tree.map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt_state=opt_state)

        def fetch_state(s):
            return jnp.sum(jax.tree_util.tree_leaves(s.params)[0]).astype(
                jnp.float32)

        chain_time(lambda s, i: adam_step_g(s, grads, i),
                   create_train_state(params, optimizer),
                   fetch_state, "adam_only_ms")

        # --- the shipped full step ---------------------------------------
        if "full_step_ms" not in skip:
            def loss_fn(p, b, rngs):
                out = model.apply(
                    {"params": p}, b["audio"], b["audio_lengths"],
                    b["phn_frames"], b["tv_targets"],
                    deterministic=False, rngs=rngs,
                )
                return out["loss"], {}

            state2 = create_train_state(init_params(), optimizer)
            step = make_train_step(loss_fn, optimizer)
            for _ in range(2):  # call 2 re-compiles (layout change)
                state2, m = step(state2, batch_data, key, jnp.float32(1e-6))
                _ = float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state2, m = step(state2, batch_data, key, jnp.float32(1e-6))
            _ = float(m["loss"])
            results["full_step_ms"] = round(
                1e3 * (time.perf_counter() - t0) / args.iters, 2)
            print(f"  full_step_ms: {results['full_step_ms']} ms",
                  file=sys.stderr)

        if {"fwd_bwd_ms", "fwd_loss_ms"} <= results.keys():
            results["bwd_delta_ms"] = round(
                results["fwd_bwd_ms"] - results["fwd_loss_ms"], 2)
        if {"fwd_loss_ms", "fwd_loss_det_ms"} <= results.keys():
            results["stochastic_tax_ms"] = round(
                results["fwd_loss_ms"] - results["fwd_loss_det_ms"], 2)
        if {"full_step_ms", "fwd_bwd_ms", "adam_only_ms"} <= results.keys():
            results["glue_delta_ms"] = round(
                results["full_step_ms"] - results["fwd_bwd_ms"]
                - results["adam_only_ms"], 2)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
