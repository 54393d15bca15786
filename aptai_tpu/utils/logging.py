"""Run logging: JSONL metric stream + optional wandb.

Replaces the reference's wandb-only logging (reference utility.py:108-138,
``init_logger`` with pickled run-id resume): every metric event is appended
to ``<exp_dir>/metrics.jsonl`` (machine-readable, survives offline runs);
wandb mirrors it when the library is installed and ``logging`` is enabled.
Run-id persistence for resume uses a plain text file.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional


class RunLogger:
    def __init__(self, exp_dir, project: str, run_name: str = "",
                 use_wandb: bool = False, resume: bool = False,
                 config: Optional[Dict] = None):
        self.exp_dir = Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.exp_dir / "metrics.jsonl"
        self._wandb = None
        if use_wandb:
            self._wandb = _init_wandb(self.exp_dir, project, run_name,
                                      resume, config or {})

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        event = {"ts": time.time(), **({"step": step} if step is not None
                                       else {}),
                 **{k: _jsonable(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(event) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return float(v) if hasattr(v, "__float__") else str(v)


def _init_wandb(exp_dir: Path, project: str, run_name: str, resume: bool,
                config: Dict):
    """wandb new-run / resume semantics of reference utility.py:112-136,
    with the run id persisted as text instead of pickle."""
    try:
        import wandb
    except ImportError:
        print("logging: wandb not available, JSONL only")
        return None
    id_file = exp_dir / "wandbRunId"
    if resume and id_file.exists():
        run_id = id_file.read_text().strip()
        return wandb.init(id=run_id, resume="allow")
    run_id = wandb.util.generate_id()
    id_file.write_text(run_id)
    return wandb.init(id=run_id, project=project, name=run_name,
                      dir=str(exp_dir), resume="allow", config=config)


def init_logger(cfg, project_name: str) -> RunLogger:
    """Drop-in for the reference's ``init_logger(cfg, project)``."""
    return RunLogger(
        cfg.exp_dir, project_name, run_name=getattr(cfg, "exp_name", ""),
        use_wandb=getattr(cfg, "logging", False),
        resume=getattr(cfg, "train_from_ckpt", False),
        config={
            "learning_rate": getattr(cfg, "learning_rate", None),
            "epochs": getattr(cfg, "num_epochs", None),
            "batch_size": getattr(cfg, "batch_size", None),
        },
    )
