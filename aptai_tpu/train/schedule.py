"""The reference's 3-phase epoch LR schedule (duplicated at reference
train/train_phoneme_recognizer.py:273-289, train/train_aptai.py:370-386,
train/train_force_aptai.py:356-372 — defined once here):

  * warmup: linear ramp to 10× base LR over ``warmup_epochs``;
  * static: hold 10× for ``static_epochs``;
  * decay: 10 · decay^(epoch − warmup − static).
"""

from __future__ import annotations


def lr_lambda(epoch: int, warmup_epochs: int, static_epochs: int,
              lr_decay: float) -> float:
    if warmup_epochs and epoch < warmup_epochs:
        return 10.0 * (epoch + 1) / warmup_epochs
    if epoch < warmup_epochs + static_epochs:
        return 10.0
    return 10.0 * lr_decay ** (epoch - (warmup_epochs + static_epochs))


def epoch_learning_rate(base_lr: float, epoch: int, warmup_epochs: int,
                        static_epochs: int, lr_decay: float) -> float:
    """LambdaLR semantics: base LR × multiplier(epoch)."""
    return base_lr * lr_lambda(epoch, warmup_epochs, static_epochs, lr_decay)
