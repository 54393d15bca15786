"""Command-line batch inference from a trainer checkpoint.

    python -m aptai_tpu.infer <checkpoint_dir> wav [wav ...] [--out DIR]

``checkpoint_dir`` is any trainer experiment dir (or its best/last/per-epoch
checkpoint subdir) — ``model_cfg.json`` makes it self-describing
(infer/loader.py), so the one CLI serves all three model families:

  * ``aptai``        → per-frame TV trajectories + frame phonemes
  * ``force_aptai``  → TVs + frame phonemes + CTC phoneme sequence
                       (``--task alignment`` emits the (phonemes × frames)
                       log-softmax alignment matrix instead)
  * ``w2v2_pr``      → beam-decoded phoneme sequence + start times
                       (reference models/w2v2_pr.py:191-235 schema)

Outputs one JSON file per utterance under ``--out`` (default: JSON lines on
stdout).  Wavs are resampled to 16 kHz on load (data/audio_io.py).  The
reference has no inference CLI at all — its eval surfaces are library calls
inside the trainers (SURVEY.md §3.4).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m aptai_tpu.infer",
        description="Batched inference from an aptai_tpu checkpoint.")
    ap.add_argument("checkpoint", help="experiment dir or checkpoint subdir")
    ap.add_argument("wavs", nargs="+", help="input wav files")
    ap.add_argument("--out", default=None,
                    help="output directory (one <stem>.json per wav); "
                         "default: JSON lines on stdout")
    ap.add_argument("--task", default="auto",
                    choices=("auto", "alignment"),
                    help="'alignment' (FORCE checkpoints only) writes the "
                         "(phonemes x frames) alignment matrix")
    ap.add_argument("--batch_size", type=int, default=16,
                    help="wavs per device batch (batched families)")
    ap.add_argument("--transfer_dtype", default="float32",
                    choices=("float32", "int16", "uint8_mulaw"),
                    help="int16 halves the host->device audio upload "
                         "(lossless for 16-bit PCM sources); uint8_mulaw "
                         "quarters it (G.711 mu-law, lossy ~38 dB SNR)")
    ap.add_argument("--dtype", default=None,
                    help="compute dtype override (e.g. float32 to run a "
                         "bf16-trained checkpoint on CPU)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    return ap


def _emit(args, stem: str, payload: dict) -> None:
    if args.out:
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / f"{stem}.json").write_text(json.dumps(payload))
    else:
        print(json.dumps({"utterance": stem, **payload}))


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield i, seq[i:i + n]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()  # repeat invocations skip the full compile

    import numpy as np

    from aptai_tpu.data.audio_io import load_wav_16k
    from aptai_tpu.data.vocab import ids_to_phonemes
    from aptai_tpu.infer.loader import load_model, load_predictor
    from aptai_tpu.infer.api import (
        APTAIPredictor, ForceAPTAIPredictor, _tv_dict,
    )

    kind, model, params, vocab = load_model(args.checkpoint,
                                            dtype=args.dtype)
    if args.task == "alignment" and kind != "force_aptai":
        print(f"--task alignment needs a force_aptai checkpoint, got {kind}",
              file=sys.stderr)
        return 2

    if kind == "w2v2_pr":
        from aptai_tpu.infer.api import W2V2PRPredictor

        pred = W2V2PRPredictor(model, params, vocab,
                               transfer_dtype=args.transfer_dtype)
    elif kind == "aptai":
        pred = APTAIPredictor(model, params,
                              transfer_dtype=args.transfer_dtype)
    else:
        pred = ForceAPTAIPredictor(model, params,
                                   transfer_dtype=args.transfer_dtype)

    stems = [Path(w).stem for w in args.wavs]
    wavs = [load_wav_16k(w) for w in args.wavs]

    if kind == "w2v2_pr":
        for stem, wav in zip(stems, wavs):
            out = pred.predict_phonemes_durations(wav)
            _emit(args, stem, {
                "phn_seq_idx": np.asarray(out["phn_seq_idx"]).tolist(),
                "phn_seq_ipa": out["phn_seq_ipa"],
                "phn_seq_dur": [float(d) for d in out["phn_seq_dur"]],
            })
        return 0

    if args.task == "alignment":
        for stem, wav in zip(stems, wavs):
            out = pred.get_alignment(wav)
            _emit(args, stem, {
                "alignment": np.asarray(out["alignment"]).tolist()})
        return 0

    fields = (("tvs_pred", "phn_fc_pred") if kind == "aptai" else
              ("tvs_pred", "pred_frame_phns", "pred_ctc_phn_seq",
               "phn_seq_lengths"))
    for start, chunk in _chunks(wavs, max(args.batch_size, 1)):
        out = pred.predict_batch(chunk, fields=fields)
        frame_lengths = np.asarray(out["frame_lengths"])
        for b, wav in enumerate(chunk):
            n = int(frame_lengths[b])
            tvs = np.asarray(out["tvs_pred"])[b, :n]
            payload = {"tvs_pred": _tv_dict(tvs)}
            if kind == "aptai":
                frames = np.asarray(out["phn_fc_pred"])[b, :n].tolist()
            else:
                frames = np.asarray(out["pred_frame_phns"])[b, :n].tolist()
                s = int(np.asarray(out["phn_seq_lengths"])[b])
                seq = np.asarray(out["pred_ctc_phn_seq"])[b, :s].tolist()
                payload["pred_ctc_phn_seq"] = seq
                payload["pred_ctc_phn_seq_ipa"] = ids_to_phonemes(vocab, seq)
            payload["pred_frame_phns"] = frames
            payload["pred_frame_phns_ipa"] = ids_to_phonemes(vocab, frames)
            _emit(args, stems[start + b], payload)
    return 0


if __name__ == "__main__":
    sys.exit(main())
