"""Shared training harness (replaces the reference's three ~1000-line
duplicated trainer scripts with one engine — SURVEY.md §7.1 step 4)."""

from aptai_tpu.train.schedule import lr_lambda, epoch_learning_rate
from aptai_tpu.train.harness import (
    TrainState,
    torch_adam,
    create_train_state,
    make_train_step,
)

__all__ = [
    "lr_lambda",
    "epoch_learning_rate",
    "TrainState",
    "torch_adam",
    "create_train_state",
    "make_train_step",
]
