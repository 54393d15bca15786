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
    print(json.dumps({
        "metric": "aptai_batched_inference_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
