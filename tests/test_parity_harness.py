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

REPO = Path(__file__).resolve().parent.parent


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
