"""A/B: APTAI train step with vs without the frozen conv-FE cache (chip).

VERDICT r4 weak #3: the frozen FE forward is the step's HBM-bound term
(6.74 of 52.11 ms at 8×5 s — train_roofline.py round 4).  This measures
the realized cut: the full train step (fwd+bwd+Adam, bf16) on the audio
path vs the ``train_from_features`` path fed the SAME utterances' cached
FE outputs (train/fe_cache.py — the shipped APTAI default).

    python benchmarks/fe_cache_ab.py [--iters 30] [--batch 16] [--secs 5]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=5.0)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from aptai_tpu.models import APTAI, Wav2Vec2Config
    from aptai_tpu.models.wav2vec2 import FeatureExtractor
    from aptai_tpu.train.harness import (create_train_state,
                                         make_train_step, torch_adam)

    cfg = Wav2Vec2Config(dtype="bfloat16")
    model = APTAI(cfg, num_phonemes=46)
    samples = int(16000 * args.secs)
    b = args.batch
    t = int(cfg.feat_extract_output_lengths(np.asarray(samples)))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((b, samples)).astype(np.float32) * 0.1)
    lengths = jnp.asarray(np.full((b,), samples, np.int32))
    phn = jnp.asarray(rng.integers(1, 46, (b, t)).astype(np.int32))
    tv = jnp.asarray(rng.standard_normal((b, t, 9)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), audio, lengths, phn, tv)
    params_host = jax.tree.map(np.asarray, variables["params"])

    # one-time FE encode for the cached arm (what FECachedLoader stores)
    fe_fn = jax.jit(lambda p, a: FeatureExtractor(cfg).apply(
        {"params": p}, a))
    feats = fe_fn(variables["params"]["encoder"]["feature_extractor"],
                  audio)
    feats = jnp.asarray(np.asarray(feats, np.float32))

    optimizer = torch_adam()

    def run(name, loss_fn, batch):
        step = make_train_step(loss_fn, optimizer, mesh=None)
        state = create_train_state(
            jax.tree.map(jnp.asarray, params_host), optimizer)
        rngk = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-5)
        # warm TWO fetched steps: the donated state re-compiles on its
        # second call (XLA-chosen layouts; CLAUDE.md)
        for _ in range(2):
            state, m = step(state, batch, rngk, lr)
            _ = float(m["loss"])
        t0 = time.perf_counter()
        last = None
        for _ in range(args.iters):
            state, m = step(state, batch, rngk, lr)
            last = m["loss"]
        _ = float(last)  # ONE fetch triggers the chained execution
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "arm": name, "ms_per_step": round(dt * 1e3, 2),
            "audio_s_per_s": round(b * args.secs / dt, 1),
        }), flush=True)
        return dt

    def loss_audio(p, bt, rngs):
        out = model.apply({"params": p}, bt["audio"], bt["audio_lengths"],
                          bt["phn_frames"], bt["tv_targets"],
                          deterministic=False, rngs=rngs)
        return out["loss"], {}

    def loss_cached(p, bt, rngs):
        out = model.apply({"params": p}, bt["fe_features"],
                          bt["audio_lengths"], bt["phn_frames"],
                          bt["tv_targets"], deterministic=False, rngs=rngs,
                          method="train_from_features")
        return out["loss"], {}

    dt_a = run("audio_path", loss_audio,
               {"audio": audio, "audio_lengths": lengths,
                "phn_frames": phn, "tv_targets": tv})
    dt_c = run("cached_fe", loss_cached,
               {"fe_features": feats, "audio_lengths": lengths,
                "phn_frames": phn, "tv_targets": tv})
    print(json.dumps({"speedup": round(dt_a / dt_c, 3),
                      "step_ms_saved": round((dt_a - dt_c) * 1e3, 2)}))


if __name__ == "__main__":
    main()
