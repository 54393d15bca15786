"""Chunk-local FORCE streaming alignment vs whole-utterance alignment.

VERDICT r3 weak #1: ``StreamingForceAPTAI`` applies the 60-phoneme cap per
chunk, so long-audio alignments are local by construction — a documented
deviation whose quality cost had been argued, never measured.  This A/B
quantifies it on lengths where BOTH paths fit (30–60 s, ≤55 phonemes so
the whole utterance stays under the reference's 60-token cap, reference
models/force_aptai.py:111,188-236):

  * A: whole-utterance ``predict`` (batch-1, unbounded attention window,
    the reference's get_faptai_output regime);
  * B: ``StreamingForceAPTAI`` (chunked encode + center-stitched frame
    outputs, chunk-local CTC decode and alignment).

Reported per utterance and aggregated:
  * frame identity between A and B (fraction of identical frame phonemes);
  * FER / boundary F1 / R-value of EACH path against the synthetic ground
    truth (so the delta attributable to chunking is explicit);
  * collapsed-sequence edit distance between A and B and vs ground truth.

    python benchmarks/streaming_alignment_ab.py --ckpt <force_run_dir> \
        [--n_utts 6] [--chunk_seconds 20] [--overlap_seconds 2]

``--tiny`` runs the harness on CPU with an untrained tiny model (mechanics
smoke; the numbers only mean something with a trained checkpoint).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _long_utterance(rng, vocab_noblank, min_phones, max_phones, cfg):
    """A 30–60 s synthetic utterance in the corpus's tone language, with
    ground-truth frame labels at the encoder rate."""
    from aptai_tpu.data.hprc_prep import phoneme_frame_labels
    from aptai_tpu.data.synthetic import _random_utterance
    from aptai_tpu.data.vocab import phonemes_to_ids

    phones, bounds, audio = _random_utterance(
        rng, min_phones=min_phones, max_phones=max_phones,
        phone_dur=(0.55, 1.05))
    timestamps = [b[0] for b in bounds] + [bounds[-1][1]]
    ids = phonemes_to_ids(vocab_noblank, phones)
    gt_frames = phoneme_frame_labels(timestamps, ids, len(audio), cfg)
    return audio, phones, gt_frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="FORCE-APTAI trainer run/checkpoint dir")
    ap.add_argument("--n_utts", type=int, default=6)
    ap.add_argument("--min_phones", type=int, default=38)
    ap.add_argument("--max_phones", type=int, default=52)
    ap.add_argument("--chunk_seconds", type=float, default=20.0)
    ap.add_argument("--overlap_seconds", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU mechanics smoke with an untrained tiny model")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from aptai_tpu.decode.native import edit_distance
    from aptai_tpu.infer.streaming import StreamingForceAPTAI
    from aptai_tpu.train.evaluate import _tv_frame_metrics
    from aptai_tpu.train.metrics import frame_ids_to_sequence

    if args.tiny:
        from aptai_tpu.data.synthetic import _PHONES
        from aptai_tpu.data.vocab import build_vocab
        from aptai_tpu.models import ForceAPTAI, tiny_config

        cfg = tiny_config()
        vocab = build_vocab([" ".join(_PHONES)])
        model = ForceAPTAI(cfg, vocab_size=len(vocab))
        wav0 = jnp.zeros((1, 3200), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), wav0,
                            jnp.full((1,), 3200, jnp.int32),
                            jnp.zeros((1, 200, 9)))["params"]
        args.n_utts, args.min_phones, args.max_phones = 2, 10, 14
        args.chunk_seconds, args.overlap_seconds = 4.0, 1.0
    else:
        if args.ckpt is None:
            raise SystemExit("--ckpt is required (or pass --tiny)")
        from aptai_tpu.infer.loader import load_model

        kind, model, params, vocab = load_model(args.ckpt)
        assert kind == "force_aptai", kind
        cfg = model.pr_cfg

    vocab_noblank = {k: v for k, v in vocab.items() if k != "(blank)"}
    rng = np.random.default_rng(args.seed)

    whole_fwd = jax.jit(lambda p, a, l: {
        k: v for k, v in model.apply({"params": p}, a, l,
                                     method="predict").items()
        if k in ("pred_frame_phns", "tvs_pred", "frame_lengths",
                 "pred_ctc_phn_seq", "phn_seq_lengths",
                 "phn_seq_truncated")})
    streamer = StreamingForceAPTAI(
        model, params, chunk_seconds=args.chunk_seconds,
        overlap_seconds=args.overlap_seconds)

    utts = [_long_utterance(rng, vocab_noblank, args.min_phones,
                            args.max_phones, cfg)
            for _ in range(args.n_utts)]
    # ONE static whole-utterance shape (audio padded to the common bucket,
    # real lengths passed) — per-utterance raw lengths would each trigger
    # a full-size compile
    bucket = max(len(a) for a, _, _ in utts)
    bucket += (-bucket) % 16_000

    rows = []
    for audio, phones, gt_frames in utts:
        gt = np.asarray(gt_frames)

        padded = np.zeros((1, bucket), np.float32)
        padded[0, : len(audio)] = audio
        w = whole_fwd(params, jnp.asarray(padded),
                      jnp.full((1,), len(audio), jnp.int32))
        t = int(np.asarray(w["frame_lengths"])[0])
        whole = np.asarray(w["pred_frame_phns"])[0, :t]
        if not args.tiny:  # an untrained tiny model decodes garbage
            assert int(np.asarray(w["phn_seq_truncated"])[0]) == 0, (
                "whole-utterance decode overflowed the 60-token cap; "
                "lower --max_phones")

        s = streamer.predict(audio)
        streamed = np.asarray(s["pred_frame_phns"])
        n = min(len(whole), len(streamed), len(gt))
        whole, streamed, gt_n = whole[:n], streamed[:n], gt[:n]

        def against_gt(pred):
            corr, total, _, (p, r, f1, rv), fce, fcl = _tv_frame_metrics(
                gt_n, pred)
            return {"FER": 1 - corr / max(total, 1), "F1": f1, "Rval": rv,
                    "seq_per": fce / max(fcl, 1)}

        seq_w = frame_ids_to_sequence(whole.tolist())
        seq_s = frame_ids_to_sequence(streamed.tolist())
        rows.append({
            "seconds": round(len(audio) / 16_000, 1),
            "phones": len(phones),
            "frame_identity_streamed_vs_whole": round(
                float((whole == streamed).mean()), 4),
            "whole": {k: round(v, 4) for k, v in against_gt(whole).items()},
            "streamed": {k: round(v, 4)
                         for k, v in against_gt(streamed).items()},
            "seq_edit_streamed_vs_whole": edit_distance(seq_w, seq_s),
            "seq_len_whole": len(seq_w),
        })

    def mean(path):
        vals = [r[path[0]][path[1]] if len(path) == 2 else r[path[0]]
                for r in rows]
        return round(float(np.mean(vals)), 4)

    report = {
        "chunk_seconds": args.chunk_seconds,
        "overlap_seconds": args.overlap_seconds,
        "n_utts": len(rows),
        "mean_frame_identity": mean(("frame_identity_streamed_vs_whole",)),
        "mean_FER_whole": mean(("whole", "FER")),
        "mean_FER_streamed": mean(("streamed", "FER")),
        "mean_F1_whole": mean(("whole", "F1")),
        "mean_F1_streamed": mean(("streamed", "F1")),
        "mean_Rval_whole": mean(("whole", "Rval")),
        "mean_Rval_streamed": mean(("streamed", "Rval")),
        "mean_seqper_whole": mean(("whole", "seq_per")),
        "mean_seqper_streamed": mean(("streamed", "seq_per")),
        "utterances": rows,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
