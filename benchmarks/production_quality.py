"""Production-topology quality evidence for the TV families, on chip.

VERDICT r2 "what's missing" #1 asked for quality evidence beyond tiny CPU
backbones.  The container has no real HPRC/CommonPhone corpora or HF
checkpoint cache, so absolute paper-parity numbers are impossible here —
but the *learnable* synthetic corpora (data/synthetic.py: distinct
narrowband tone per phoneme, TVs a deterministic smoothed function of the
phoneme sequence) let us demonstrate that the production-size stack
(24-layer / hidden-1024 wav2vec2-large topology) actually LEARNS the task
end-to-end through the real trainer CLIs:

  * stage B — APTAI from scratch, one LOSO fold: held-out-speaker test
    PCC / RMSE / FER / overlap (reference train/train_aptai.py protocol);
  * stage C — FORCE head over a CONVERGED full-size PR checkpoint (e.g.
    the decode-identity run's, val PER 0.04): alignment FER / overlap +
    CTC-seq PER on the held-out speaker.

The synthetic F-rate variant decimates audio 2× (doubling every tone
frequency), which makes F acoustically ambiguous for a tone-keyed
recognizer — N-rate metrics are the meaningful ones; F is reported for
completeness.

    python benchmarks/production_quality.py \
        --pr_dir /tmp/decode_identity2/pr [--skip_force] [--skip_aptai]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, ".")


def _make_corpus_on_cpu(root: Path, utts_per_speaker: int) -> Path:
    """Generate the synthetic HPRC tree in a CPU-platform subprocess.

    ``make_synthetic_hprc`` computes mspec/mfcc with jnp ops at a distinct
    audio length per utterance; under the pinned axon platform every
    utterance would trigger a remote compile (~minutes each).  A child
    process that flips jax to CPU *before* backend init keeps the chip out
    of corpus prep entirely.
    """
    repo_root = str(Path(__file__).resolve().parents[1])
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {repo_root!r})\n"
        "from aptai_tpu.data import make_synthetic_hprc\n"
        f"make_synthetic_hprc({str(root)!r}, "
        f"utts_per_speaker={utts_per_speaker})\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    return root / "hprc.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts_per_speaker", type=int, default=48)
    ap.add_argument("--epochs_aptai", type=int, default=60)
    ap.add_argument("--warmup_aptai", type=int, default=6)
    ap.add_argument("--static_aptai", type=int, default=30)
    ap.add_argument("--epochs_force", type=int, default=40)
    ap.add_argument("--warmup_force", type=int, default=4)
    ap.add_argument("--static_force", type=int, default=20)
    ap.add_argument("--lr", type=float, default=3e-5,
                    help="base LR; the 3-phase schedule ramps to 10x "
                         "(peak 1e-3 collapses from-scratch training — "
                         "PERF.md decode-identity section)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--pr_dir", default="/tmp/decode_identity2/pr",
                    help="converged full-size PR run dir (stage C tower); "
                         "its vocab.json must cover the synthetic phones")
    ap.add_argument("--skip_aptai", action="store_true")
    ap.add_argument("--skip_force", action="store_true")
    ap.add_argument("--force_decode_method", default="greedy",
                    choices=("greedy", "beam_device"),
                    help="stage C in-step CTC decode: the shipped greedy "
                         "default, or the on-device prefix beam (true "
                         "reference beam semantics in one XLA program)")
    ap.add_argument("--off_diag_prior", action="store_true",
                    help="stage C: enable the reference's (shipped-"
                         "disabled) off-diagonal Gaussian alignment prior")
    ap.add_argument("--prior_g", type=float, default=0.2)
    ap.add_argument("--energy_temperature", type=float, default=1.0)
    ap.add_argument("--blank_logprob", type=float, default=-1.0)
    ap.add_argument("--frame_hidden_layer", type=int, default=-1,
                    help="stage C: tower hidden state feeding the FORCE "
                         "frame path (-1 = final, reference-exact)")
    ap.add_argument("--aux_frame_ce", type=float, default=0.0,
                    help="stage C: weight of the tower-posterior frame-CE "
                         "distillation (0 = off)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny backbone, 2 epochs")
    ap.add_argument("--work", default="/tmp/production_quality")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from aptai_tpu.data import make_synthetic_hprc
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_aptai, train_force_aptai
    from aptai_tpu.train.config import APTAIConfig, ForceAPTAIConfig

    work = Path(args.work)
    tiny = tiny_config() if args.tiny else None
    if args.tiny:
        args.epochs_aptai = args.epochs_force = 2
        args.utts_per_speaker = 3

    hprc_csv = work / "hprc" / "hprc.csv"
    if not hprc_csv.exists():
        if args.tiny:
            hprc_csv = make_synthetic_hprc(
                work / "hprc", utts_per_speaker=args.utts_per_speaker,
                cfg=tiny)
        else:
            hprc_csv = _make_corpus_on_cpu(
                work / "hprc", args.utts_per_speaker)
    import pandas as pd

    spk = str(pd.read_csv(hprc_csv).speaker.iloc[0])
    report = {
        "topology": "tiny" if args.tiny else "24L/1024 (wav2vec2-large)",
        "utts_per_speaker": args.utts_per_speaker,
        "held_out_speaker": spk,
        "lr": args.lr,
    }

    keys = ("mean_rmse", "mean_pcc", "mean_FER", "mean_PER", "mean_overlap",
            "mean_F1", "mean_Rval")
    if not args.skip_aptai:
        cfg = APTAIConfig(
            exp_dir=str(work / "aptai"), hprc_csv_path=str(hprc_csv),
            vocab_path="", num_epochs=args.epochs_aptai,
            num_warmup_epochs=args.warmup_aptai,
            num_static_epochs=args.static_aptai,
            batch_size=args.batch_size, learning_rate=args.lr,
            mesh_data=1, ckpt_every=0,
        ).finalize("APTAI")
        mean, _, _ = train_aptai.run(cfg, tiny_backbone=tiny, speakers=[spk])
        report["aptai"] = {
            f"test_{r}_{k}": round(mean[f"test_{r}_{k}"], 4)
            for r in ("N", "F") for k in keys}

    if not args.skip_force:
        pr_dir = Path(args.pr_dir)
        if not (pr_dir / "vocab.json").exists():
            raise SystemExit(
                f"--pr_dir {pr_dir} has no vocab.json; train a PR first "
                "(e.g. benchmarks/converged_decode_identity.py)")
        cfg = ForceAPTAIConfig(
            exp_dir=str(work / f"force_{args.force_decode_method}"),
            hprc_csv_path=str(hprc_csv),
            pr_model_path=str(pr_dir),
            vocab_path=str(pr_dir / "vocab.json"),
            num_epochs=args.epochs_force,
            num_warmup_epochs=args.warmup_force,
            num_static_epochs=args.static_force,
            batch_size=args.batch_size, learning_rate=args.lr,
            decode_method=args.force_decode_method,
            off_diag_prior=args.off_diag_prior, prior_g=args.prior_g,
            energy_temperature=args.energy_temperature,
            blank_logprob=args.blank_logprob,
            aux_frame_ce=args.aux_frame_ce,
            frame_hidden_layer=args.frame_hidden_layer,
            mesh_data=1,
        ).finalize("FORCE_APTAI")
        fmean, _, _ = train_force_aptai.run(cfg, tiny_backbone=tiny,
                                            speakers=[spk])
        report["force_decode_method"] = args.force_decode_method
        report["alignment_knobs"] = {
            "off_diag_prior": args.off_diag_prior, "prior_g": args.prior_g,
            "energy_temperature": args.energy_temperature,
            "blank_logprob": args.blank_logprob,
            "aux_frame_ce": args.aux_frame_ce,
            "frame_hidden_layer": args.frame_hidden_layer}
        report["force"] = {
            f"test_{r}_{k}": round(fmean[f"test_{r}_{k}"], 4)
            for r in ("N", "F") for k in keys}
        report["force"]["test_N_ctc_seq_per"] = round(
            fmean["test_N_ctc_seq_per"], 4)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
