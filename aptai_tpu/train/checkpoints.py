"""Checkpointing with the reference's experiment-directory semantics.

Directory scheme (reference train/train_phoneme_recognizer.py:640-648,
456-486; SURVEY.md §5.4):

  <exp_dir>/
    experiment_args.json      — full config
    vocab.json                — phoneme vocabulary
    best-model-ckpt/          — params at the best target metric
    last-model-ckpt/          — params + optimizer state + step (resume)
    model-ckpts/e%04d/        — optional per-epoch params

Selection: best-by-target-metric with a bigger/smaller-is-better switch
(train_phoneme_recognizer.py:458-471).  Serialization is flax msgpack
(host-independent, works for sharded arrays after device_get).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
from flax import serialization

from aptai_tpu.utils.trees import fetch_pytree


def _to_host(tree):
    return fetch_pytree(tree)


def save_pytree(path, tree) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(serialization.to_bytes(_to_host(tree)))


def load_pytree(path, target):
    """Restore into the structure of ``target`` (an example pytree)."""
    return serialization.from_bytes(target, Path(path).read_bytes())


def save_json(path, obj) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if dataclasses.is_dataclass(obj):
        obj = dataclasses.asdict(obj)
    Path(path).write_text(json.dumps(obj, indent=2, default=str))


def load_json(path) -> Dict:
    return json.loads(Path(path).read_text())


class CheckpointManager:
    """best / last / per-epoch checkpoints with target-metric selection."""

    def __init__(
        self,
        exp_dir,
        target_metric: str,
        bigger_is_better: bool = False,
        save_all_epochs: bool = False,
    ):
        self.exp_dir = Path(exp_dir)
        self.target_metric = target_metric
        self.bigger_is_better = bigger_is_better
        self.save_all_epochs = save_all_epochs
        self.best_value: Optional[float] = None
        self.best_dir = self.exp_dir / "best-model-ckpt"
        self.last_dir = self.exp_dir / "last-model-ckpt"
        self.all_dir = self.exp_dir / "model-ckpts"
        self.exp_dir.mkdir(parents=True, exist_ok=True)

    def is_improvement(self, value: float) -> bool:
        """Reference comparison incl. ties counting as improvement
        (train_phoneme_recognizer.py:458-462 uses <= / >=)."""
        if self.best_value is None:
            return True
        if self.bigger_is_better:
            return self.best_value <= value
        return self.best_value >= value

    def update(
        self,
        epoch: int,
        metrics: Dict[str, float],
        params,
        opt_state=None,
        step: int = 0,
        model_cfg: Optional[Dict] = None,
        save_last: bool = True,
    ) -> bool:
        """Save last (+ per-epoch), and best when the target improves.
        Returns True if this epoch became the new best.

        ``params``/``opt_state`` may be DEVICE trees: they are fetched to
        host (pipelined, :func:`~aptai_tpu.utils.trees.fetch_pytree`) only
        when this epoch actually writes a checkpoint.  ``save_last=False``
        skips the last-checkpoint write for this epoch (``--ckpt_every``
        cadence) — on a remote-tunnel device the every-epoch fetch of
        params + Adam moments is minutes of wall clock, so non-improving
        epochs should not pay it.  An improving epoch always writes last
        too, keeping ``train_meta.json`` coherent with the newest
        on-disk params for resume.
        """
        value = float(metrics[self.target_metric])
        improved = self.is_improvement(value)
        if improved:
            self.best_value = value
        save_last = save_last or improved
        if improved or self.save_all_epochs or save_last:
            params = fetch_pytree(params)

        if improved:
            save_pytree(self.best_dir / "params.msgpack", params)
            if model_cfg is not None:
                save_json(self.best_dir / "model_cfg.json", model_cfg)

        if self.save_all_epochs:
            save_pytree(self.all_dir / f"e{epoch:04d}" / "params.msgpack",
                        params)

        if save_last:
            save_pytree(self.last_dir / "params.msgpack", params)
            if opt_state is not None:
                save_pytree(self.last_dir / "opt_state.msgpack",
                            fetch_pytree(opt_state))
            save_json(self.last_dir / "train_meta.json", {
                "epoch": epoch,
                "step": int(step),
                "best_value": self.best_value,
                "metrics": {k: float(v) for k, v in metrics.items()},
            })
            if model_cfg is not None:
                save_json(self.last_dir / "model_cfg.json", model_cfg)
        return improved

    def save_interrupt(self, resume_epoch: int, params, opt_state=None,
                       step: int = 0, model_cfg: Optional[Dict] = None):
        """Preemption write (SIGTERM/SIGUSR1 → graceful stop): a
        ``last-model-ckpt`` whose meta resumes at ``resume_epoch``.

        A mid-epoch interrupt passes the interrupted epoch itself — resume
        REPEATS it, at-least-once semantics: the partial epoch's optimizer
        progress is kept (params + moments + step counter are the
        post-interrupt values), only the epoch-granular bookkeeping rolls
        back.  An epoch-boundary interrupt passes ``epoch + 1``."""
        params = fetch_pytree(params)
        save_pytree(self.last_dir / "params.msgpack", params)
        if opt_state is not None:
            save_pytree(self.last_dir / "opt_state.msgpack",
                        fetch_pytree(opt_state))
        save_json(self.last_dir / "train_meta.json", {
            "epoch": resume_epoch - 1,
            "step": int(step),
            "best_value": self.best_value,
            "metrics": {},
            "preempted": True,
        })
        if model_cfg is not None:
            save_json(self.last_dir / "model_cfg.json", model_cfg)

    def restore_last(self, params_example, opt_state_example=None):
        """Resume support (the reference leaves this half-wired for the
        APTAI trainers — SURVEY.md §5.3; fully implemented here)."""
        params = load_pytree(self.last_dir / "params.msgpack", params_example)
        meta = load_json(self.last_dir / "train_meta.json")
        self.best_value = meta.get("best_value")
        opt_state = None
        opt_path = self.last_dir / "opt_state.msgpack"
        if opt_state_example is not None and opt_path.exists():
            opt_state = load_pytree(opt_path, opt_state_example)
        return params, opt_state, meta

    def restore_best(self, params_example):
        return load_pytree(self.best_dir / "params.msgpack", params_example)
