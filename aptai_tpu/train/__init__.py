"""Shared training harness (replaces the reference's three ~1000-line
duplicated trainer scripts with one engine — SURVEY.md §7.1 step 4)."""

from aptai_tpu.train.schedule import lr_lambda, epoch_learning_rate
from aptai_tpu.train.harness import (
    Engine,
    TrainState,
    create_train_state,
    make_engine,
    make_train_step,
    torch_adam,
    trainable_mask,
)

__all__ = [
    "lr_lambda",
    "epoch_learning_rate",
    "Engine",
    "TrainState",
    "torch_adam",
    "trainable_mask",
    "create_train_state",
    "make_engine",
    "make_train_step",
]
