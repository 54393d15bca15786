"""Locate the predict-path residual: total − profiled modules (chained).

benchmarks/PERF.md round 3 accounts FE 18.5 + pos-conv 5.3 + 24-layer
stack 83.8 ≈ 107.6 ms of the ~125 ms predict total (batch 32 × 10 s,
bf16) — this script times the remaining glue (feature projection, final
LayerNorm, frame-mask, TV/phoneme heads incl. the FIR low-pass,
softmax/argmax) and the two composed totals (full APTAI ``predict`` vs
encoder-only) so the gap decomposes into named pieces instead of "~17 ms
unaccounted".

    python benchmarks/predict_glue_profile.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.encoder_profile import chain_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from aptai_tpu.models import APTAI, Wav2Vec2Config
    from aptai_tpu.models.wav2vec2 import FeatureProjection, Wav2Vec2Encoder
    from aptai_tpu.ops.fir import fir_lowpass, lowpass_fir_taps

    B, SECONDS = 32, 10
    cfg = Wav2Vec2Config(dtype="bfloat16")
    dtype = jnp.bfloat16
    HID = cfg.hidden_size
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    samples = 16_000 * SECONDS
    audio = jnp.asarray(rng.standard_normal((B, samples)) * 0.1, jnp.float32)
    lengths = jnp.full((B,), samples, jnp.int32)
    t_frames = int(cfg.feat_extract_output_lengths(np.asarray(samples)))

    model = APTAI(cfg, num_phonemes=46)
    variables = model.init(key, audio, lengths, method="predict")
    params = variables["params"]

    results = {"t_frames": t_frames}

    # ---- composed totals (real modules, real params)
    def predict_full(a):
        out = model.apply({"params": params},
                          audio + a[0].astype(audio.dtype) * 0, lengths,
                          method="predict")
        return (jnp.sum(out["tvs_pred"])
                + jnp.sum(out["phn_fc_pred"].astype(jnp.float32))
                )[None].astype(jnp.bfloat16)

    results["predict_total_ms"] = 1e3 * chain_time(
        predict_full, jnp.zeros((1,), dtype), args.iters)

    enc = Wav2Vec2Encoder(cfg)
    enc_params = params["encoder"]

    def encoder_only(a):
        h, _, _ = enc.apply({"params": enc_params},
                            audio + a[0].astype(audio.dtype) * 0, lengths,
                            deterministic=True)
        return jnp.sum(h)[None].astype(jnp.bfloat16)

    results["encoder_total_ms"] = 1e3 * chain_time(
        encoder_only, jnp.zeros((1,), dtype), args.iters)

    # ---- glue pieces at the real activation shapes
    x512 = jnp.asarray(rng.standard_normal((B, t_frames, 512)), dtype)
    x1024 = jnp.asarray(rng.standard_normal((B, t_frames, HID)), dtype)

    fp = FeatureProjection(cfg)
    fp_vars = fp.init(key, x512, True)
    results["feature_projection_ms"] = 1e3 * chain_time(
        lambda a: fp.apply(fp_vars, a, True), x512, args.iters)

    ln = nn.LayerNorm(dtype=dtype)
    ln_vars = ln.init(key, x1024)
    results["final_layernorm_ms"] = 1e3 * chain_time(
        lambda a: ln.apply(ln_vars, a), x1024, args.iters)

    frame_mask = jnp.ones((B, t_frames, 1), dtype)
    results["frame_mask_mul_ms"] = 1e3 * chain_time(
        lambda a: a * frame_mask, x1024, args.iters)

    # heads exactly as models/aptai.py::_heads (eval: dropout inactive)
    w_tv = jnp.asarray(rng.standard_normal((HID, 9)) * 0.02, jnp.float32)
    w_ph = jnp.asarray(rng.standard_normal((HID, 46)) * 0.02, jnp.float32)
    taps = lowpass_fir_taps(10.0, 49.0)

    def heads(a):
        tv = jnp.tanh(a)
        tv = tv.astype(jnp.float32) @ w_tv
        tv = fir_lowpass(tv, taps)
        ph = nn.leaky_relu(a).astype(jnp.float32) @ w_ph
        probs = jax.nn.softmax(ph, axis=-1)
        pred = jnp.argmax(probs, axis=-1)
        return (jnp.sum(tv) + jnp.sum(pred.astype(jnp.float32))
                )[None].astype(jnp.bfloat16)

    results["heads_tv_phn_ms"] = 1e3 * chain_time(
        lambda a: heads(x1024 + a[0] * 0), jnp.zeros((1,), dtype), args.iters)

    results["heads_glue_delta_ms"] = (
        results["predict_total_ms"] - results["encoder_total_ms"])

    for k, v in results.items():
        results[k] = round(float(v), 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
