"""The one-command reference-parity harness (VERDICT r2 missing #1) runs
offline end-to-end and passes on synthetic inputs.

The heavier trained-checkpoint round-trip (--train_pr_epochs N) is exercised
manually / in PERF.md; this keeps the suite to the fast random-weight mode,
which still pushes identical weights through both stacks for all three
model families."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

# each test shells out a full harness run (minutes); deselect for quick
# iteration with -m "not slow"
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def test_parity_harness_trained_aptai_roundtrip(tmp_path):
    """--aptai_exp_dir: a TRAINED APTAI checkpoint's encoder + heads export
    to torch and the forwards agree (VERDICT r3 next #7 — trained-weight
    export fidelity; the same path runs at production size on the chip's
    quality-run checkpoint)."""
    import pandas as pd

    from aptai_tpu.data import make_synthetic_hprc
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_aptai
    from aptai_tpu.train.config import APTAIConfig

    tiny = tiny_config()
    hprc = make_synthetic_hprc(tmp_path / "hprc", utts_per_speaker=2,
                               cfg=tiny)
    spk = str(pd.read_csv(hprc).speaker.iloc[0])
    cfg = APTAIConfig(
        exp_dir=str(tmp_path / "aptai"), hprc_csv_path=str(hprc),
        vocab_path="", num_epochs=2, num_warmup_epochs=1,
        num_static_epochs=1, batch_size=2, learning_rate=1e-4, mesh_data=1,
        ckpt_every=0,
    ).finalize("APTAI")
    train_aptai.run(cfg, tiny_backbone=tiny, speakers=[spk])

    out = tmp_path / "verdict.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_vs_reference.py"),
         "--out", str(out), "--n_utts", "2",
         "--aptai_exp_dir",
         str(Path(cfg.exp_dir) / f"best-model-ckpt-{spk}")],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    v = json.loads(out.read_text())
    assert "trained_aptai_ckpt" in v["mode"]
    assert v["aptai"]["pass"] and v["aptai"]["tv_pearson_min"] > 0.999


def test_parity_harness_synthetic_mode(tmp_path):
    out = tmp_path / "verdict.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_vs_reference.py"),
         "--out", str(out), "--n_utts", "2"],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    v = json.loads(out.read_text())
    assert v["overall_pass"]
    assert v["aptai"]["tv_pearson_min"] > 0.999
    assert v["force"]["align_loss_rel_diff"] < 0.01
    assert v["w2v2_pr"]["logit_max_abs_diff"] < 1e-3


def test_parity_harness_trained_force_roundtrip(tmp_path):
    """--force_exp_dir: a TRAINED FORCE head (xatt/PE/BiLSTM/FIR +
    ForwardSum with the run's alignment knobs) exports to torch and the
    forwards agree (VERDICT r4 missing #4 — the last trained-export cell;
    the same path runs at production size on the stage-C checkpoint).
    Trains with the NEW knobs on so the replica covers them."""
    import pandas as pd

    from aptai_tpu.data import make_synthetic_hprc
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_pr, train_force_aptai
    from aptai_tpu.train.config import ForceAPTAIConfig, PRConfig

    tiny = tiny_config()
    hprc = make_synthetic_hprc(tmp_path / "hprc", utts_per_speaker=2,
                               cfg=tiny)
    spk = str(pd.read_csv(hprc).speaker.iloc[0])

    from aptai_tpu.data import make_synthetic_commonphone

    cp = make_synthetic_commonphone(tmp_path / "cp", 4, 1, 1)
    pr_cfg = PRConfig(
        exp_dir=str(tmp_path / "pr"), cp_csv_path=str(cp),
        hprc_csv_path="", laptop=True, batch_size=2, samples_per_epoch=2,
        learning_rate=1e-4, mesh_data=1,
    ).finalize("phoneme_recognizer")
    train_pr.run(pr_cfg, tiny_backbone=tiny)

    cfg = ForceAPTAIConfig(
        exp_dir=str(tmp_path / "force"), hprc_csv_path=str(hprc),
        pr_model_path=pr_cfg.exp_dir,
        vocab_path=str(Path(pr_cfg.exp_dir) / "vocab.json"),
        num_epochs=2, num_warmup_epochs=1, num_static_epochs=1,
        batch_size=2, learning_rate=1e-4, mesh_data=1,
        off_diag_prior=True, energy_temperature=0.7, blank_logprob=-1.5,
    ).finalize("FORCE_APTAI")
    train_force_aptai.run(cfg, tiny_backbone=tiny, speakers=[spk])

    out = tmp_path / "verdict.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_vs_reference.py"),
         "--out", str(out), "--n_utts", "2",
         "--force_exp_dir",
         str(Path(cfg.exp_dir) / f"best-model-ckpt-{spk}")],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    v = json.loads(out.read_text())
    assert "trained_force_ckpt" in v["mode"]
    assert v["force_trained"]["pass"], v["force_trained"]
    assert v["force_trained"]["tv_pearson_min"] > 0.999
