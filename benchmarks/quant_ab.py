"""A/B the W8A8 quant modes on the flagship inference path (real chip).

For quant in (none, w8a8_ffn, w8a8): build the full-size bf16 APTAI with
IDENTICAL params, time the chained batched predict (bench.py methodology),
and report audio-s/s plus the output deviation vs the exact bf16 forward
(TV RMS relative error + frame-phoneme argmax agreement).

    python benchmarks/quant_ab.py [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--modes", default="none,w8a8_ffn,w8a8")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from aptai_tpu.models import APTAI, Wav2Vec2Config

    batch, seconds = 32, 10
    samples = 16_000 * seconds
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, samples)).astype(np.float32) * 0.1)
    lengths = jnp.asarray(np.full((batch,), samples, np.int32))

    base_cfg = Wav2Vec2Config(dtype="bfloat16")
    params = None
    ref_tvs = ref_phns = None

    for mode in args.modes.split(","):
        cfg = dataclasses.replace(base_cfg, quant=mode)
        model = APTAI(cfg, num_phonemes=46)
        if params is None:
            # init directly on the device (bench.py methodology): CPU-init +
            # device_put leaves row-major param buffers whose layouts
            # mismatch the executable's XLA-chosen ones — on the axon
            # tunnel that costs a full param relayout round trip PER CALL
            # (~22 s/iter measured; the param tree is quant-invariant so
            # one init serves every mode)
            variables = model.init(jax.random.PRNGKey(0), audio, lengths,
                                   method="predict")
            params = variables["params"]

        @jax.jit
        def forward(p, a, l, chain):
            out = model.apply({"params": p}, a + 0.0 * chain, l,
                              method="predict")
            return (jnp.sum(out["tvs_pred"])
                    + jnp.sum(out["phn_fc_pred"].astype(jnp.float32)))

        s = jnp.float32(0.0)
        for _ in range(3):
            s = forward(params, audio, lengths, s)
        _ = float(s)

        t0 = time.perf_counter()
        s = jnp.float32(0.0)
        for _ in range(args.iters):
            s = forward(params, audio, lengths, s)
        _ = float(s)
        dt = time.perf_counter() - t0
        rtf = batch * seconds * args.iters / dt

        # one un-chained forward for quality comparison
        out = jax.jit(lambda p, a, l: model.apply(
            {"params": p}, a, l, method="predict"))(params, audio, lengths)
        tvs = np.asarray(out["tvs_pred"], np.float32)
        phns = np.asarray(out["phn_fc_pred"])
        row = {"mode": mode, "audio_s_per_s": round(rtf, 1)}
        if ref_tvs is None:
            ref_tvs, ref_phns = tvs, phns
        else:
            rel = (np.linalg.norm(tvs - ref_tvs)
                   / np.linalg.norm(ref_tvs))
            row["tv_rel_err_vs_exact"] = round(float(rel), 5)
            row["phn_argmax_agreement"] = round(
                float((phns == ref_phns).mean()), 5)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
