"""``aptai-eval``: the reference's full test-metric suite from any trainer
checkpoint — no training run required.

    aptai-eval CHECKPOINT MANIFEST [--rate N,F] [--speaker SPK]
               [--split test] [--decode beam|greedy|beam_device]
               [--csv metrics.csv] [--cpu]

The reference can only produce its test metrics as the tail of a full
trainer invocation (reference train/train_aptai.py:655-838 runs inside the
LOSO loop; train/train_phoneme_recognizer.py:687-725 inside ``__main__``);
re-scoring an existing model means re-running the trainer.  Here the
checkpoint is self-describing (``model_cfg.json`` → infer/loader.py), so one
command scores any of the three families on any manifest:

  * ``w2v2_pr``      → corpus PER + mean CTC loss, per manifest split
                       (CommonPhone format) or per rate (HPRC format) —
                       the reference's test protocol (beam decode default);
  * ``aptai``        → per-rate test dict: per-TV RMSE/PCC, FER, FC-PER,
                       overlap, boundary P/R/F1/R-value
                       (reference train/train_aptai.py:655-838 metric set);
  * ``force_aptai``  → the APTAI dict + decoded CTC-sequence PER
                       (reference train/train_force_aptai.py adds it).

Output: one JSON object on stdout; ``--csv`` additionally writes the
flattened dict in the trainers' ``test_metrics/*.csv`` format.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="aptai-eval",
        description="Score an aptai_tpu checkpoint on a manifest "
                    "(PER for recognizers; the 15-metric TV test dict for "
                    "APTAI/FORCE).")
    ap.add_argument("checkpoint", help="experiment dir or checkpoint subdir")
    ap.add_argument("manifest", help="CommonPhone- or HPRC-format csv")
    ap.add_argument("--rate", default="N,F",
                    help="comma list of HPRC rates to score separately "
                         "(HPRC manifests only; default N,F)")
    ap.add_argument("--speaker", default=None,
                    help="restrict to one speaker (HPRC manifests)")
    ap.add_argument("--split", default=None,
                    help="restrict to one value of the manifest's 'split' "
                         "column (e.g. test); default: every row")
    ap.add_argument("--decode", default="beam",
                    choices=("beam", "greedy", "beam_device"),
                    help="PR decode for PER (beam = the reference's "
                         "reported-PER protocol)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_batches", type=int, default=None,
                    help="cap batches per loader (smoke runs)")
    ap.add_argument("--csv", default=None,
                    help="also write the flattened metrics as csv")
    ap.add_argument("--dtype", default=None,
                    help="compute dtype override (e.g. float32 to score a "
                         "bf16-trained checkpoint on CPU)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()  # repeat invocations skip the full compile

    import jax
    import pandas as pd

    from aptai_tpu.data import BucketedLoader, HPRCDataset
    from aptai_tpu.data.batching import collate_ctc, collate_tv
    from aptai_tpu.data.commonphone import CommonPhoneDataset
    from aptai_tpu.infer.loader import load_model
    from aptai_tpu.train.evaluate import test_tv, validate_pr
    from aptai_tpu.train.metrics import dict_to_csv

    kind, model, params, vocab = load_model(args.checkpoint,
                                            dtype=args.dtype)
    params = jax.device_put(params)

    df = pd.read_csv(args.manifest)
    if args.split is not None:
        if "split" not in df:
            print(f"--split {args.split}: manifest has no 'split' column",
                  file=sys.stderr)
            return 2
        df = df[df.split == args.split]
    if args.speaker is not None:
        if "speaker" not in df:
            print("--speaker: manifest has no 'speaker' column",
                  file=sys.stderr)
            return 2
        df = df[df.speaker.astype(str) == args.speaker]
    if not len(df):
        print("no manifest rows left after filtering", file=sys.stderr)
        return 2

    # manifest format: HPRC carries per-frame targets; CommonPhone carries
    # a 'phonemes' transcript column (data/commonphone.py vs data/hprc.py)
    is_hprc = "phoneme_labels" in df.columns
    rates = [r for r in args.rate.split(",") if r] if is_hprc else [None]
    bad = [r for r in rates if r not in (None, "N", "F", "both")]
    if bad or (is_hprc and not rates):
        print(f"--rate must be a comma list of N / F / both, got "
              f"{args.rate!r}", file=sys.stderr)
        return 2
    results = {"checkpoint": str(args.checkpoint), "kind": kind,
               "manifest": str(args.manifest), "utterances": int(len(df))}
    n_meta_keys = len(results)

    if kind == "w2v2_pr":
        from aptai_tpu.train.train_pr import make_eval_forward

        fwd = functools.partial(make_eval_forward(model), params)
        for rate in rates:
            if rate is None:
                ds = CommonPhoneDataset(df, vocab)
                tag = "cp"
            else:
                ds = HPRCDataset(df, vocab, rate=rate)
                tag = f"hprc{rate}"
                if not len(ds):
                    continue
            dl = BucketedLoader(ds, batch_size=args.batch_size,
                                collate_fn=collate_ctc, shuffle=False)
            scored = validate_pr(fwd, dl, max_batches=args.max_batches,
                                 decode=args.decode)
            results[f"mean_{tag}_per"] = scored["mean_val_per"]
            results[f"mean_{tag}_loss"] = scored["mean_val_loss"]
    else:
        if not is_hprc:
            print(f"a {kind} checkpoint needs an HPRC-format manifest "
                  "(TV targets + frame phonemes)", file=sys.stderr)
            return 2
        if kind == "aptai":
            from aptai_tpu.train.train_aptai import make_eval_forward
        else:
            from aptai_tpu.train.train_force_aptai import make_eval_forward
        fwd = functools.partial(make_eval_forward(model), params)
        for rate in rates:
            ds = HPRCDataset(df, vocab, rate=rate)
            if not len(ds):
                continue
            dl = BucketedLoader(ds, batch_size=args.batch_size,
                                collate_fn=collate_tv, shuffle=False)
            results.update(test_tv(fwd, dl, rate,
                                   max_batches=args.max_batches))
            if kind == "force_aptai":
                from aptai_tpu.train.train_force_aptai import ctc_seq_per

                results[f"test_{rate}_ctc_seq_per"] = ctc_seq_per(
                    fwd, dl, args.max_batches,
                    # stdout carries exactly one JSON object
                    log_fn=lambda m: print(m, file=sys.stderr))

    if len(results) == n_meta_keys:  # nothing was scored
        print(f"no utterances matched the requested rate(s) {rates} — no "
              "metrics produced", file=sys.stderr)
        return 2

    print(json.dumps(results, indent=2))
    if args.csv:
        dict_to_csv({k: v for k, v in results.items()
                     if isinstance(v, (int, float))}, args.csv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
