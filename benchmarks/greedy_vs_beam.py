"""Greedy-vs-beam in-step decode comparison for FORCE-APTAI.

SURVEY.md §7.3 item 1: the TPU build replaces the reference's host beam
search inside every training step (reference models/w2v2_pr.py:144-155
called from models/force_aptai.py:97) with a batched on-device greedy
collapse.  This experiment verifies the substitution preserves alignment
quality: train FORCE twice on the synthetic corpus — identical data, seed,
and schedule, differing only in ``decode_method`` — and compare validation
RMSE / FER / CTC-seq PER plus wall-clock per epoch.

Runs on CPU-JAX (controlled comparison; does not claim the TPU):

    python benchmarks/greedy_vs_beam.py [--epochs 6] [--utts 6]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--pr_epochs", type=int, default=24,
                    help="PR pretrain epochs: the reference pipeline runs "
                    "FORCE on a CONVERGED recognizer (stage 1); an "
                    "undertrained PR makes the in-step decode choice "
                    "matter (beam rescues weak logits) and is not the "
                    "regime the substitution targets")
    ap.add_argument("--utts", type=int, default=6,
                    help="synthetic utterances per speaker")
    ap.add_argument("--work", default="/tmp/greedy_vs_beam")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from aptai_tpu.data import make_synthetic_commonphone, make_synthetic_hprc
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_force_aptai, train_pr
    from aptai_tpu.train.config import ForceAPTAIConfig, PRConfig

    tiny = tiny_config()
    work = Path(args.work)
    if work.exists():
        # stale experiment dirs would flip the trainers into resume mode
        # (config.finalize: train_from_ckpt = exp_dir.exists()) and taint
        # the twin-run comparison — start clean.  Only delete a directory
        # this script created (marker subdirs from a prior run); refuse to
        # rmtree an arbitrary --work path the user may care about.
        ours = (work / "pr").exists() or any(work.glob("force_*"))
        if not ours and any(work.iterdir()):
            raise SystemExit(
                f"--work {work} exists and does not look like a previous "
                "run of this script (no pr/ or force_* subdirs); refusing "
                "to delete it — pass a fresh path"
            )
        shutil.rmtree(work)
    work.mkdir(parents=True, exist_ok=True)
    cp_csv = make_synthetic_commonphone(work / "cp", 48, 6, 6)
    hprc_csv = make_synthetic_hprc(work / "hprc", utts_per_speaker=args.utts,
                                   cfg=tiny)

    # a short PR pretrain so the in-step decoder emits non-degenerate
    # sequences (mirrors the reference pipeline stage 1, SURVEY.md §1)
    pr_cfg = PRConfig(
        exp_dir=str(work / "pr"), cp_csv_path=str(cp_csv), hprc_csv_path="",
        num_epochs=args.pr_epochs, num_warmup_epochs=2,
        num_static_epochs=max(args.pr_epochs - 6, 2),
        batch_size=4, samples_per_epoch=64, learning_rate=3e-4,
        mesh_data=1,
    ).finalize("phoneme_recognizer")
    train_pr.run(pr_cfg, tiny_backbone=tiny)

    results = {}
    for method in ("greedy", "beam_host"):
        cfg = ForceAPTAIConfig(
            exp_dir=str(work / f"force_{method}"),
            hprc_csv_path=str(hprc_csv),
            vocab_path=str(Path(pr_cfg.exp_dir) / "vocab.json"),
            pr_model_path=pr_cfg.exp_dir,
            num_epochs=args.epochs, num_warmup_epochs=1,
            num_static_epochs=2, batch_size=4, learning_rate=5e-4,
            train_val_rate="both", decode_method=method, mesh_data=1,
            seed=0,
        ).finalize("FORCE_APTAI")
        t0 = time.perf_counter()
        mean, std, per_spk = train_force_aptai.run(cfg, tiny_backbone=tiny,
                                                   speakers=["M01"])
        dt = time.perf_counter() - t0
        results[method] = {
            "wall_seconds": round(dt, 1),
            **{k: round(v, 5) for k, v in mean.items()
               if k in ("test_N_mean_rmse", "test_N_mean_FER",
                        "test_N_mean_pcc", "test_N_ctc_seq_per",
                        "test_N_mean_overlap")},
        }

    print(json.dumps(results, indent=2))
    print("\n| metric | greedy (on-device) | beam_host (reference) |")
    print("|---|---|---|")
    keys = sorted(set(results["greedy"]) | set(results["beam_host"]))
    for k in keys:
        print(f"| {k} | {results['greedy'].get(k)} "
              f"| {results['beam_host'].get(k)} |")


if __name__ == "__main__":
    main()
