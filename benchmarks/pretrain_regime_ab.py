"""Does self-supervised pretraining manufacture the reference's regime?

VERDICT r4 missing #2: the reference's whole chain starts from a
speech-PRETRAINED tower (reference models/w2v2_pr.py:28-33), and round 4
measured that a from-scratch CTC tower discards per-frame phone identity
(linear probe held-out FER 0.453 vs majority 0.737 on the 24L tower,
benchmarks/frame_probe.py) — capping FORCE alignment at the silence
floor.  This experiment asks the question the probe left open: **does a
self-supervised pretrained tower (train/pretrain.py) raise the frame
ceiling and the CTC quality at a fixed fine-tune budget?**

Controlled comparison at equal size and fine-tune budget:

  1. pretrain an L-layer tower on the synthetic CommonPhone audio
     (masked-contrastive, no labels);
  2. CTC fine-tune (a) from scratch [control] and (b) from the
     pretrained tower [treatment] with IDENTICAL recipe/budget;
  3. linear-probe both towers' frozen features on the HPRC frame labels
     (frame_probe.py, same split as stage C) + record val/beam PER.

    python benchmarks/pretrain_regime_ab.py \
        [--layers 12] [--pretrain_epochs 60] [--ft_epochs 100] \
        [--hprc_csv /tmp/production_quality/hprc/hprc.csv]

Output: one JSON block with {pretrain metrics, control PER+probe,
treatment PER+probe}.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def probe(pr_dir: str, hprc_csv: str) -> dict:
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "frame_probe.py"),
         "--pr_dir", pr_dir, "--hprc_csv", hprc_csv],
        capture_output=True, text=True, check=True)
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/pretrain_ab")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--train_utts", type=int, default=512)
    ap.add_argument("--pretrain_epochs", type=int, default=60)
    ap.add_argument("--pretrain_lr", type=float, default=5e-5,
                    help="3-phase schedule peaks at 10x")
    ap.add_argument("--ft_epochs", type=int, default=100)
    ap.add_argument("--ft_lr", type=float, default=3e-5,
                    help="the round-4 from-scratch CTC recipe LR")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--hprc_csv",
                    default="/tmp/production_quality/hprc/hprc.csv",
                    help="frame-labelled corpus for the linear probe")
    ap.add_argument("--skip_pretrain", action="store_true",
                    help="reuse an existing pretrain run in --work")
    ap.add_argument("--skip_control", action="store_true")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from aptai_tpu.data import make_synthetic_commonphone
    from aptai_tpu.train import pretrain, train_pr
    from aptai_tpu.train.config import PRConfig

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    cp_csv = work / "cp" / "commonphone.csv"
    if not cp_csv.exists():
        cp_csv = make_synthetic_commonphone(
            work / "cp", args.train_utts, 16, 16)

    report = {"layers": args.layers, "train_utts": args.train_utts,
              "ft": {"epochs": args.ft_epochs, "lr": args.ft_lr,
                     "samples_per_epoch": args.train_utts}}

    # --- 1. self-supervised pretraining (labels unused) ------------------
    pre_dir = work / "pretrain"
    if not args.skip_pretrain:
        pcfg = pretrain.PretrainConfig(
            exp_dir=str(pre_dir), audio_csv_path=str(cp_csv),
            num_epochs=args.pretrain_epochs,
            num_warmup_epochs=max(args.pretrain_epochs // 10, 1),
            num_static_epochs=args.pretrain_epochs // 2,
            batch_size=args.batch_size, learning_rate=args.pretrain_lr,
            num_hidden_layers=args.layers, mesh_data=1, ckpt_every=0,
        ).finalize("pretrain")
        history, _ = pretrain.run(pcfg)
        report["pretrain"] = {
            k: round(history[-1][k], 4) for k in
            ("val_loss", "val_contrastive_loss", "val_contrastive_accuracy",
             "val_codebook_perplexity")}

    # --- 2. CTC fine-tune: control (scratch) vs treatment (pretrained) ---
    def finetune(name: str, pretrained: str | None) -> dict:
        cfg = PRConfig(
            exp_dir=str(work / name), cp_csv_path=str(cp_csv),
            hprc_csv_path="", num_epochs=args.ft_epochs,
            num_warmup_epochs=8,
            num_static_epochs=max(args.ft_epochs * 6 // 10, 1),
            batch_size=args.batch_size,
            samples_per_epoch=args.train_utts,  # full corpus passes — the
            # round-4 blank-breakthrough recipe (ROUND4_NOTES.md)
            learning_rate=args.ft_lr, mesh_data=1, val_decode="greedy",
            ckpt_every=0, num_hidden_layers=args.layers,
            pretrained_checkpoint=pretrained,
        ).finalize("phoneme_recognizer")
        history, results = train_pr.run(cfg)
        best_val = min(h["mean_val_per"] for h in history)
        first_sub_50 = next((h["epoch"] for h in history
                             if h["mean_val_per"] < 0.5), None)
        out = {
            "final_val_per": round(history[-1]["mean_val_per"], 4),
            "best_val_per": round(best_val, 4),
            "beam_test_per": round(float(results["mean_cp_test_per"]), 4),
            "first_epoch_below_0.5_per": first_sub_50,
            "exp_dir": cfg.exp_dir,
        }
        if Path(args.hprc_csv).exists():
            pr = probe(cfg.exp_dir, args.hprc_csv)
            out["probe_heldout_FER"] = pr["probe_heldout_FER"]
            out["probe_majority_FER"] = pr["majority_class_FER"]
        return out

    if not args.skip_control:
        report["control_scratch"] = finetune("ft_scratch", None)
    report["treatment_pretrained"] = finetune("ft_pretrained", str(pre_dir))

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
