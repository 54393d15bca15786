"""Flagship benchmark: batched APTAI inference real-time factor on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference has no published numbers (BASELINE.md); the north star from
BASELINE.json is ≥20× real-time audio-sec/sec/chip for batched inference, so
``vs_baseline = value / 20``.  The benchmark runs the full-size backbone
(wav2vec2-large topology: 7-conv FE + 24×1024 transformer) in bf16 with the
Pallas flash-attention path, batch of 10 s utterances, steady-state timing.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.models import APTAI, Wav2Vec2Config

    backend = jax.default_backend()
    cfg = Wav2Vec2Config(dtype="bfloat16" if backend == "tpu" else "float32")
    model = APTAI(cfg, num_phonemes=46)

    if backend == "tpu":
        batch, seconds, iters, warmup = 32, 10, 10, 3
    else:  # CPU smoke fallback
        batch, seconds, iters, warmup = 1, 1, 2, 1

    samples = 16_000 * seconds
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, samples)).astype(np.float32) * 0.1
    )
    lengths = jnp.asarray(np.full((batch,), samples, np.int32))

    variables = model.init(jax.random.PRNGKey(0), audio, lengths,
                           method="predict")
    params = variables["params"]

    @jax.jit
    def forward(params, audio, lengths, chain):
        # `chain` threads a scalar dependency through iterations so the whole
        # timed loop executes sequentially on device with ONE final host
        # fetch (the axon tunnel executes lazily: block_until_ready does not
        # force execution, and per-iteration fetches add ~30 ms RTT each)
        out = model.apply(
            {"params": params}, audio + 0.0 * chain, lengths, method="predict"
        )
        return (jnp.sum(out["tvs_pred"])
                + jnp.sum(out["phn_fc_pred"].astype(jnp.float32)))

    # warmup / compile
    s = jnp.float32(0.0)
    for _ in range(warmup):
        s = forward(params, audio, lengths, s)
    _ = float(s)

    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(iters):
        s = forward(params, audio, lengths, s)
    _ = float(s)
    dt = time.perf_counter() - t0

    audio_seconds = batch * seconds * iters
    rtf = audio_seconds / dt

    # MFU accounting (VERDICT r3 missing #3): analytic model FLOPs over the
    # measured wall clock against the chip's bf16 peak.  Unknown device
    # kinds (CPU smoke) omit the MFU fields rather than guess a peak.
    from aptai_tpu.utils.flops import (aptai_forward_flops,
                                       device_peak_tflops, mfu,
                                       training_step_flops)

    peak = device_peak_tflops(jax.devices()[0])
    infer_flops = batch * aptai_forward_flops(cfg, samples) * iters
    infer_mfu = mfu(infer_flops, dt, peak)

    # training throughput (fwd+bwd + Adam), same chained-execution
    # methodology — VERDICT r1 weak #10 asked for a driver-visible
    # training number next to the inference one
    train_rtf, train_dt, train_fwd_flops = _training_rtf(model, cfg, backend)
    train_flops = training_step_flops(train_fwd_flops, cfg.remat_policy)
    train_mfu = mfu(train_flops, train_dt, peak)

    result = {
        "metric": "aptai_batched_inference_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 20.0, 3),
        "training_rtf": round(train_rtf, 2),
        "achieved_tflops": round(infer_flops / dt / 1e12, 1),
        "train_achieved_tflops": round(train_flops / train_dt / 1e12, 1),
    }
    if infer_mfu is not None:
        result["mfu"] = round(infer_mfu, 4)
        result["train_mfu"] = round(train_mfu, 4)
        result["peak_tflops"] = peak
    print(json.dumps(result))


def _training_rtf(model, cfg, backend):
    """Returns (audio_s/s, wall seconds, total forward FLOPs timed)."""
    import jax
    import jax.numpy as jnp

    from aptai_tpu.train import create_train_state, make_train_step, torch_adam

    # the trainers' default PRNG (train/config.py::rng_impl): XLA's
    # RngBitGenerator for dropout/SpecAugment masks — threefry mask bits
    # cost 9.6 ms of the 66.6 ms blessed-shape step (train_profile.py)
    jax.config.update("jax_default_prng_impl", "rbg")

    batch, seconds, iters = (8, 5, 5) if backend == "tpu" else (1, 1, 1)
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

    def loss_fn(p, b, rngs):
        out = model.apply(
            {"params": p}, b["audio"], b["audio_lengths"],
            b["phn_frames"], b["tv_targets"],
            deterministic=False, rngs=rngs,
        )
        return out["loss"], {}

    optimizer = torch_adam()
    state = create_train_state(
        jax.device_put(variables["params"], jax.devices()[0]), optimizer)
    step = make_train_step(loss_fn, optimizer)
    key = jax.random.PRNGKey(1)
    # TWO warm steps, each fetched: call 1 compiles; call 2 RE-compiles
    # (the updated state comes back with XLA-chosen layouts that differ
    # from the freshly device_put input state, changing the jit signature
    # — measured 127 s at full size, benchmarks/PERF.md round 2); call 3+
    # reuse the second executable at steady state.
    for _ in range(2):
        state, m = step(state, batch_data, key, jnp.float32(1e-5))
        _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_data, key, jnp.float32(1e-5))
    _ = float(m["loss"])
    dt = time.perf_counter() - t0

    from aptai_tpu.utils.flops import aptai_forward_flops

    fwd_flops = batch * aptai_forward_flops(cfg, samples) * iters
    return batch * seconds * iters / dt, dt, fwd_flops


if __name__ == "__main__":
    main()
