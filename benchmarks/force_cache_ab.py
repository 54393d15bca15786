"""A/B: FORCE-APTAI training with vs without the frozen-tower encoding
cache (train/frozen_cache.py) at full backbone size on one chip.

The reference recomputes the frozen wav2vec2 tower (+ a host beam decode)
inside every training step of every epoch (reference
train/train_force_aptai.py:403-429 → models/force_aptai.py:80-115).  With
the cache, the tower runs once per utterance and every epoch's step is the
~0.5M-parameter head alone.  This measures all three step costs and
derives the end-to-end training speedup at the blessed epoch count:

  * direct step  — frozen tower fwd + head fwd/bwd + Adam (cache OFF)
  * encode batch — tower fwd alone (the one-time cache-build cost)
  * head step    — head fwd/bwd + Adam from cached encodings (cache ON)

Methodology: chained scalar + one fetch (axon executes lazily), two warm
fetched steps before timing (donated-state re-compile on call 2 —
benchmarks/PERF.md round 2).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # run from the repo root, like the other benchmarks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=int, default=5)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--epochs", type=int, default=60,
                   help="blessed FORCE epoch count for the amortized ratio")
    p.add_argument("--rng_impl", default="rbg",
                   help="PRNG for dropout masks; 'rbg' is the trainer "
                        "default (train/config.py)")
    p.add_argument("--only_head", action="store_true",
                   help="measure just the head-only-state step (batch "
                        "scaling probe: the scans' sequential latency is "
                        "batch-invariant)")
    args = p.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.rng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", args.rng_impl)

    import jax.numpy as jnp

    from aptai_tpu.models import ForceAPTAI, Wav2Vec2Config
    from aptai_tpu.train.frozen_cache import _cache_encode_fn
    from aptai_tpu.train.harness import (create_train_state, make_train_step,
                                         torch_adam)
    from aptai_tpu.train.train_force_aptai import force_loss_fn

    backend = jax.default_backend()
    cfg = Wav2Vec2Config(dtype="bfloat16" if backend == "tpu" else "float32")
    model = ForceAPTAI(cfg, vocab_size=46)

    b, samples = args.batch, 16_000 * args.seconds
    t = int(cfg.feat_extract_output_lengths(np.asarray(samples)))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.standard_normal((b, samples)) * 0.1).astype(np.float32))
    lengths = jnp.asarray(np.full(b, samples, np.int32))
    tvs = jnp.asarray(rng.standard_normal((b, t, 9)).astype(np.float32))

    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda k: model.init(
                k, jnp.zeros((1, samples), jnp.float32),
                jnp.full((1,), samples, jnp.int32),
                jnp.zeros((1, t, 9))),
            backend="cpu")(jax.random.PRNGKey(0))

    # each phase gets a FRESH device placement: the donated train steps
    # consume their state's buffers, so sharing one placement across
    # phases dies with an invalid-buffer TPU error
    def fresh_params():
        return jax.device_put(variables["params"], jax.devices()[0])

    params = fresh_params()

    optimizer = torch_adam(frozen_prefixes=("w2v2_pr",))

    def timed_steps(step, state, batch, label):
        key = jax.random.PRNGKey(1)
        for _ in range(2):  # compile + donated-layout recompile
            state, m = step(state, batch, key, jnp.float32(1e-5))
            _ = float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, batch, key, jnp.float32(1e-5))
        _ = float(m["loss"])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{label}: {ms:.1f} ms/step")
        return ms

    # --- encode (cache build) cost: tower forward alone, chained ---
    enc_fn = _cache_encode_fn(model)

    if args.only_head:
        enc = enc_fn(params, audio, lengths)
        enc_batch = {
            "frame_embs": enc["frame_embs"],
            "enc_frame_lengths": enc["frame_lengths"],
            "phn_pred_seq": enc["phn_pred_seq"],
            "phn_seq_lengths": enc["phn_seq_lengths"],
            "phn_seq_truncated": enc["phn_seq_truncated"],
            "tv_targets": tvs,
        }

        def head_only_params():
            return jax.device_put(
                {k: v for k, v in variables["params"].items()
                 if k != "w2v2_pr"}, jax.devices()[0])

        slim_opt = torch_adam()
        slim_step = make_train_step(
            force_loss_fn(model, from_encoded=True), slim_opt)
        ms = timed_steps(
            slim_step, create_train_state(head_only_params(), slim_opt),
            enc_batch, f"head step (head-only state, batch {b})")
        print(f"throughput: {b * args.seconds / (ms / 1e3):.1f} "
              "audio-s/s/chip")
        return

    def enc_chain(p, a, l, c):
        out = enc_fn(p, a + 0.0 * c, l)
        return jnp.sum(out["frame_embs"].astype(jnp.float32))

    s = jnp.float32(0.0)
    for _ in range(2):
        s = enc_chain(params, audio, lengths, s)
    _ = float(s)
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(args.iters):
        s = enc_chain(params, audio, lengths, s)
    _ = float(s)
    enc_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"encode batch (cache build): {enc_ms:.1f} ms/batch")

    # --- direct step (cache OFF): tower + head fwd/bwd + Adam ---
    direct_batch = {"audio": audio, "audio_lengths": lengths,
                    "tv_targets": tvs}
    direct_step = make_train_step(force_loss_fn(model), optimizer)
    direct_ms = timed_steps(
        direct_step, create_train_state(fresh_params(), optimizer),
        direct_batch, "direct step (cache off)")

    # --- head step (cache ON): train_from_encoded ---
    params = fresh_params()
    enc = enc_fn(params, audio, lengths)
    enc_batch = {
        "frame_embs": enc["frame_embs"],
        "enc_frame_lengths": enc["frame_lengths"],
        "phn_pred_seq": enc["phn_pred_seq"],
        "phn_seq_lengths": enc["phn_seq_lengths"],
        "phn_seq_truncated": enc["phn_seq_truncated"],
        "tv_targets": tvs,
    }
    head_step = make_train_step(
        force_loss_fn(model, from_encoded=True), optimizer)
    head_ms = timed_steps(
        head_step, create_train_state(fresh_params(), optimizer), enc_batch,
        "head step (cache on)")

    # --- head step with a head-ONLY TrainState: the encoded loss never
    # touches the tower, so carrying the ~315M frozen params through the
    # donated state is pure overhead (zero-grad materialization + masked
    # -Adam passthrough + state movement); this isolates that cost ---
    def head_only_params():
        return jax.device_put(
            {k: v for k, v in variables["params"].items()
             if k != "w2v2_pr"}, jax.devices()[0])

    slim_opt = torch_adam()  # nothing frozen left to mask
    slim_step = make_train_step(
        force_loss_fn(model, from_encoded=True), slim_opt)
    slim_ms = timed_steps(
        slim_step, create_train_state(head_only_params(), slim_opt),
        enc_batch, "head step (head-only state)")

    e = args.epochs
    total_off = e * direct_ms
    total_on = enc_ms + e * slim_ms
    audio_s = args.batch * args.seconds
    print(f"\nper-epoch-step totals over {e} blessed epochs "
          f"(per batch position): off {total_off:.0f} ms, "
          f"on {total_on:.0f} ms -> {total_off / total_on:.1f}x")
    print(f"steady-state train throughput: "
          f"{audio_s / (direct_ms / 1e3):.1f} -> "
          f"{audio_s / (slim_ms / 1e3):.1f} audio-s/s/chip")


if __name__ == "__main__":
    main()
