"""Greedy ≡ beam at convergence: the substitution's precondition, measured.

VERDICT r2 weak #9: the greedy-for-beam in-step decode substitution
(SURVEY.md §7.3 item 1; reference models/w2v2_pr.py:144-155 runs a host
beam search inside every FORCE training step) rests on the claim that a
CONVERGED stage-1 recognizer emits logits peaked enough that greedy and
beam decoding return the *same sequences* — which makes the two FORCE
training variants literally identical.  Round 2 argued this from
peaked-logits theory because tiny CPU recognizers could not converge; this
experiment demonstrates it end-to-end at the production topology:

  1. train the production-size PR (24-layer / hidden-1024 wav2vec2-large
     topology) to convergence on the learnable synthetic CommonPhone
     corpus, on the TPU, with the unmodified `train_pr` CLI path;
  2. decode every held-out utterance BOTH ways from the same logits —
     on-device-greedy collapse vs the reference-contract host beam search
     (beam_size 10, decode/beam.py);
  3. report: fraction of utterances where the decoded sequences are
     IDENTICAL, PER under each decode, and mean per-frame posterior peak
     (the sharpness the argument rests on).

Also usable on CPU with --backbone tiny for a smoke run:

    python benchmarks/converged_decode_identity.py [--epochs 120] \
        [--backbone full] [--work /tmp/decode_identity]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--static", type=int, default=60)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--samples_per_epoch", type=int, default=128)
    ap.add_argument("--train_utts", type=int, default=96)
    ap.add_argument("--eval_utts", type=int, default=16)
    ap.add_argument("--train_eval_utts", type=int, default=128,
                    help="cap on train-split utterances decoded for the "
                         "converged-domain identity measurement")
    ap.add_argument("--backbone", choices=("full", "tiny"), default="full")
    ap.add_argument("--num_layers", type=int, default=24,
                    help="encoder depth (full backbone only)")
    ap.add_argument("--disable_reg", action="store_true",
                    help="zero every dropout and turn SpecAugment off on "
                         "the full backbone: the experiment's claim is "
                         "about converged posteriors, and on the 96-"
                         "utterance synthetic corpus regularization only "
                         "slows memorization down")
    # 0 = checkpoint only at the end: with ties-improve best selection a
    # plateaued val PER re-writes best EVERY epoch, and over the tunnel
    # each write is a ~4 min params+moments fetch
    ap.add_argument("--ckpt_every", type=int, default=0)
    ap.add_argument("--work", default="/tmp/decode_identity")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np
    import pandas as pd

    if args.backbone == "tiny":
        jax.config.update("jax_platforms", "cpu")

    from aptai_tpu.data import make_synthetic_commonphone
    from aptai_tpu.data.vocab import load_vocab
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_pr
    from aptai_tpu.train.builders import build_pr_model
    from aptai_tpu.train.checkpoints import CheckpointManager
    from aptai_tpu.train.config import PRConfig
    from aptai_tpu.train.evaluate import decode_best, decode_greedy
    from aptai_tpu.train.metrics import PERAccumulator
    from aptai_tpu.train.train_pr import make_eval_forward, make_loaders

    work = Path(args.work)
    if work.exists():
        if not (work / "pr").exists() and any(work.iterdir()):
            raise SystemExit(
                f"--work {work} exists and does not look like a previous "
                "run of this script; refusing to delete it")
        shutil.rmtree(work)
    work.mkdir(parents=True)
    cp_csv = make_synthetic_commonphone(
        work / "cp", args.train_utts, args.eval_utts, args.eval_utts)

    if args.backbone == "tiny":
        tiny = tiny_config()
    elif args.disable_reg:
        # full production width/depth, regularization off — passed through
        # the explicit-backbone hook of build_pr_model (train/builders.py)
        from aptai_tpu.models import Wav2Vec2Config
        from aptai_tpu.train.builders import resolve_dtype

        tiny = Wav2Vec2Config(
            num_hidden_layers=args.num_layers,
            hidden_dropout=0.0, activation_dropout=0.0,
            attention_dropout=0.0, feat_proj_dropout=0.0,
            final_dropout=0.0, apply_spec_augment=False,
            dtype=resolve_dtype("auto"),
        )
    else:
        tiny = None
    pr_cfg = PRConfig(
        exp_dir=str(work / "pr"), cp_csv_path=str(cp_csv), hprc_csv_path="",
        num_epochs=args.epochs, num_warmup_epochs=args.warmup,
        num_static_epochs=args.static, batch_size=args.batch_size,
        samples_per_epoch=args.samples_per_epoch,
        learning_rate=args.lr, mesh_data=1, val_decode="greedy",
        ckpt_every=args.ckpt_every, num_hidden_layers=args.num_layers,
    ).finalize("phoneme_recognizer")
    history, results = train_pr.run(pr_cfg, tiny_backbone=tiny)

    # --- restore the selected best checkpoint, rebuild the eval forward
    vocab = load_vocab(Path(pr_cfg.exp_dir) / "vocab.json")
    model, params, _ = build_pr_model(pr_cfg, vocab, tiny=tiny)
    ckpt = CheckpointManager(Path(pr_cfg.exp_dir), pr_cfg.target_metric,
                             bigger_is_better=False)
    best = jax.device_put(ckpt.restore_best(params))
    fwd = make_eval_forward(model)

    df = pd.read_csv(cp_csv)
    _, valid_dl, test_dl, _ = make_loaders(pr_cfg, df, vocab)
    # the train split again, uncropped/unshuffled: the regime where the
    # recognizer is fully converged — the analog of FORCE decoding with a
    # converged stage-1 PR on its own domain
    from aptai_tpu.data.batching import BucketedLoader, collate_ctc
    from aptai_tpu.data.commonphone import CommonPhoneDataset

    train_rows = df[df.split == "train"].head(args.train_eval_utts)
    train_eval_dl = BucketedLoader(
        CommonPhoneDataset(train_rows, vocab), collate_fn=collate_ctc,
        batch_size=pr_cfg.eval_batch_size or pr_cfg.batch_size,
        shuffle=False)

    def decode_identity(loaders):
        stats = {"n": 0, "identical": 0, "peaks": []}
        per_greedy, per_beam = PERAccumulator(), PERAccumulator()
        for dl in loaders:
            for batch in dl:
                out = fwd(best, batch)
                log_probs = np.asarray(out["log_probs"], np.float32)
                frame_lengths = np.asarray(out["frame_lengths"])
                mask = batch.get("batch_pad_mask",
                                 np.ones(len(log_probs), bool))
                for b in range(len(log_probs)):
                    if not mask[b]:
                        continue
                    labels = batch["phoneme_labels"][b]
                    gt = labels[labels >= 0].tolist()
                    lp = log_probs[b, : frame_lengths[b]]
                    g = decode_greedy(lp)
                    bm = decode_best(lp)
                    stats["n"] += 1
                    stats["identical"] += int(g == bm)
                    stats["peaks"].append(float(np.mean(np.exp(lp.max(-1)))))
                    per_greedy.update(gt, g)
                    per_beam.update(gt, bm)
        return {
            "utterances": stats["n"],
            "identical_sequences_fraction": round(
                stats["identical"] / max(stats["n"], 1), 4),
            "per_greedy": round(per_greedy.per, 4),
            "per_beam": round(per_beam.per, 4),
            "mean_posterior_peak": round(float(np.mean(stats["peaks"])), 4),
        }

    out = {
        "backbone": args.backbone,
        "num_layers": args.num_layers,
        "disable_reg": args.disable_reg,
        "lr": args.lr,
        "epochs": args.epochs,
        "train_utts": args.train_utts,
        "final_train_loss": round(float(history[-1]["mean_train_loss"]), 4)
        if history else None,
        "cp_test_per_beam_from_trainer": round(
            float(results["mean_cp_test_per"]), 4),
        "heldout": decode_identity((valid_dl, test_dl)),
        "train_split": decode_identity((train_eval_dl,)),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
