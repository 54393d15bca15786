"""Locate the predict-path residual: total − profiled modules (chained).

benchmarks/PERF.md round 3 accounts FE 18.5 + pos-conv 5.3 + 24-layer
stack 83.8 ≈ 107.6 ms of the ~125 ms predict total (batch 32 × 10 s,
bf16) — this script times the remaining glue (feature projection, final
LayerNorm, frame-mask, TV/phoneme heads incl. the FIR low-pass,
softmax/argmax) and the two composed totals (full APTAI ``predict`` vs
encoder-only) so the gap decomposes into named pieces instead of "~17 ms
unaccounted".

Methodology notes: params init on CPU and ``device_put`` (CLAUDE.md), and
every jitted timing passes params/audio as ARGUMENTS — closure-captured
megabyte constants make the staged HLO big enough to break the remote
compile service (observed: two ~30-min broken-pipe failures).

    python benchmarks/predict_glue_profile.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_args_time(jfn, params, args, chain0, iters):
    """bench.py methodology: jfn(params, *args, chain) -> scalar; chained
    through `chain`, two warm calls (layout-stable second), one fetch."""
    s = chain0
    for _ in range(2):
        s = jfn(params, *args, s)
    _ = float(s)
    t0 = time.perf_counter()
    s = chain0
    for _ in range(iters):
        s = jfn(params, *args, s)
    _ = float(s)
    return (time.perf_counter() - t0) / iters


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

    samples = 16_000 * SECONDS
    audio = jnp.asarray(rng.standard_normal((B, samples)) * 0.1, jnp.float32)
    lengths = jnp.asarray(np.full((B,), samples, np.int32))
    t_frames = int(cfg.feat_extract_output_lengths(np.asarray(samples)))

    model = APTAI(cfg, num_phonemes=46)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda k: model.init(
                k, jnp.zeros((1, 16000), jnp.float32),
                jnp.full((1,), 16000, jnp.int32), method="predict",
            ), backend="cpu")(jax.random.PRNGKey(0))
    params = jax.device_put(variables["params"], jax.devices()[0])

    results = {"t_frames": t_frames}
    z = jnp.float32(0.0)

    # ---- composed totals (real modules, real params, bench.py-style)
    @jax.jit
    def predict_full(p, a, l, chain):
        out = model.apply({"params": p}, a + 0.0 * chain, l,
                          method="predict")
        return (jnp.sum(out["tvs_pred"])
                + jnp.sum(out["phn_fc_pred"].astype(jnp.float32)))

    results["predict_total_ms"] = 1e3 * chain_args_time(
        predict_full, params, (audio, lengths), z, args.iters)

    enc = Wav2Vec2Encoder(cfg)
    enc_params = params["encoder"]

    @jax.jit
    def encoder_only(p, a, l, chain):
        h, _, _ = enc.apply({"params": p}, a + 0.0 * chain, l,
                            deterministic=True)
        return jnp.sum(h).astype(jnp.float32)

    results["encoder_total_ms"] = 1e3 * chain_args_time(
        encoder_only, enc_params, (audio, lengths), z, args.iters)

    # ---- glue pieces at the real activation shapes
    x512 = jnp.asarray(rng.standard_normal((B, t_frames, 512)), dtype)
    x1024 = jnp.asarray(rng.standard_normal((B, t_frames, HID)), dtype)

    fp = FeatureProjection(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        fp_vars = jax.device_put(
            fp.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 512), dtype),
                    True),
            jax.devices()[0])

    @jax.jit
    def fp_step(v, x, chain):
        out = fp.apply(v, x + chain.astype(x.dtype), True)
        return jnp.sum(out).astype(jnp.float32)

    results["feature_projection_ms"] = 1e3 * chain_args_time(
        fp_step, fp_vars, (x512,), z, args.iters)

    ln = nn.LayerNorm(dtype=dtype)
    ln_vars = ln.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, HID), dtype))

    @jax.jit
    def ln_step(v, x, chain):
        return jnp.sum(ln.apply(v, x + chain.astype(x.dtype))
                       ).astype(jnp.float32)

    results["final_layernorm_ms"] = 1e3 * chain_args_time(
        ln_step, ln_vars, (x1024,), z, args.iters)

    # heads exactly as models/aptai.py::_heads (eval: dropout inactive)
    w_tv = jnp.asarray(rng.standard_normal((HID, 9)) * 0.02, jnp.float32)
    w_ph = jnp.asarray(rng.standard_normal((HID, 46)) * 0.02, jnp.float32)
    taps = jnp.asarray(lowpass_fir_taps(10.0, 49.0))

    @jax.jit
    def heads_step(ws, x, chain):
        wt, wp, tp = ws
        a = x + chain.astype(x.dtype)
        tv = jnp.tanh(a).astype(jnp.float32) @ wt
        tv = fir_lowpass(tv, tp)
        ph = nn.leaky_relu(a).astype(jnp.float32) @ wp
        pred = jnp.argmax(jax.nn.softmax(ph, axis=-1), axis=-1)
        return jnp.sum(tv) + jnp.sum(pred.astype(jnp.float32))

    results["heads_tv_phn_ms"] = 1e3 * chain_args_time(
        heads_step, (w_tv, w_ph, taps), (x1024,), z, args.iters)

    results["glue_delta_ms"] = (
        results["predict_total_ms"] - results["encoder_total_ms"])

    for k, v in results.items():
        results[k] = round(float(v), 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
