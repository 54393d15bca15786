"""A/B benchmark: XLA conv feature extractor vs the fused Pallas kernel.

VERDICT r1 item #4: round 1's fused conv+LN+GELU kernel measured 1682 vs
1882 audio-sec/s because its per-tile HBM DMA was serial.  Round 2 added a
static two-slot double buffer (ops/fused_conv.py); this driver measures the
full-model batched-inference RTF with the flag off vs on, on the real chip,
using the same chained-execution methodology as bench.py.

    python benchmarks/fused_fe_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run(fused: bool, iters: int = 10, warmup: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    from aptai_tpu.models import APTAI, Wav2Vec2Config

    backend = jax.default_backend()
    cfg = Wav2Vec2Config(
        dtype="bfloat16" if backend == "tpu" else "float32",
        fused_feature_extractor=fused,
    )
    model = APTAI(cfg, num_phonemes=46)
    if backend == "tpu":
        batch, seconds = 32, 10
    else:
        batch, seconds, iters, warmup = 1, 1, 2, 1

    samples = 16_000 * seconds
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, samples)).astype(np.float32) * 0.1)
    lengths = jnp.asarray(np.full((batch,), samples, np.int32))

    variables = model.init(jax.random.PRNGKey(0), audio, lengths,
                           method="predict")
    params = variables["params"]

    @jax.jit
    def forward(params, audio, lengths, chain):
        out = model.apply(
            {"params": params}, audio + 0.0 * chain, lengths, method="predict")
        return (jnp.sum(out["tvs_pred"])
                + jnp.sum(out["phn_fc_pred"].astype(jnp.float32)))

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
    return batch * seconds * iters / dt


def main():
    sys.path.insert(0, ".")
    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    results = {}
    for fused in (False, True):
        rtf = run(fused)
        results["fused" if fused else "xla"] = round(rtf, 1)
        print(json.dumps({"fe": "fused" if fused else "xla",
                          "rtf_audio_sec_per_s": round(rtf, 1)}),
              flush=True)
    print(json.dumps({"metric": "fused_fe_ab", **results}))


if __name__ == "__main__":
    main()
