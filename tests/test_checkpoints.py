"""Checkpoint manager semantics + full trainer resume."""

import numpy as np
import jax.numpy as jnp
import pytest

from aptai_tpu.train.checkpoints import (
    CheckpointManager,
    load_pytree,
    save_pytree,
)


def test_pytree_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": jnp.ones((4,), jnp.int32)}}
    save_pytree(tmp_path / "x.msgpack", tree)
    out = load_pytree(tmp_path / "x.msgpack", tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], np.ones(4))


def test_best_selection_smaller_is_better(tmp_path):
    ckpt = CheckpointManager(tmp_path, "val_loss", bigger_is_better=False)
    p1 = {"w": np.asarray([1.0])}
    p2 = {"w": np.asarray([2.0])}
    p3 = {"w": np.asarray([3.0])}
    assert ckpt.update(0, {"val_loss": 0.5}, p1)
    assert not ckpt.update(1, {"val_loss": 0.7}, p2)
    assert ckpt.update(2, {"val_loss": 0.5}, p3)  # tie counts as improvement
    best = ckpt.restore_best(p1)
    np.testing.assert_array_equal(best["w"], [3.0])
    # last always tracks the most recent epoch
    last, _, meta = ckpt.restore_last(p1)
    np.testing.assert_array_equal(last["w"], [3.0])
    assert meta["epoch"] == 2


def test_best_selection_bigger_is_better(tmp_path):
    ckpt = CheckpointManager(tmp_path, "acc", bigger_is_better=True)
    assert ckpt.update(0, {"acc": 0.1}, {"w": np.asarray([1.0])})
    assert not ckpt.update(1, {"acc": 0.05}, {"w": np.asarray([2.0])})
    assert ckpt.update(2, {"acc": 0.2}, {"w": np.asarray([3.0])})


def test_trainer_resume(tmp_path):
    """Interrupt a PR training run after epoch 0 and resume into epoch 1:
    the resumed run must not re-run epoch 0 and must keep the optimizer
    state + best watermark."""
    import pandas as pd

    from aptai_tpu.data import make_synthetic_commonphone
    from aptai_tpu.models import tiny_config
    from aptai_tpu.train import train_pr
    from aptai_tpu.train.config import PRConfig

    cp_csv = make_synthetic_commonphone(tmp_path / "cp", 4, 1, 1)
    exp = tmp_path / "run"

    def mk(epochs):
        cfg = PRConfig(
            exp_dir=str(exp), cp_csv_path=str(cp_csv), hprc_csv_path="",
            laptop=False, num_epochs=epochs, batch_size=2,
            samples_per_epoch=4, learning_rate=1e-4, mesh_data=1,
        )
        cfg.date_time = "t"
        return cfg

    cfg1 = mk(1)
    cfg1.train_from_ckpt = False
    h1, _ = train_pr.run(cfg1, tiny_backbone=tiny_config())

    cfg2 = mk(2)
    cfg2.train_from_ckpt = True
    h2, _ = train_pr.run(cfg2, tiny_backbone=tiny_config())
    assert [e["epoch"] for e in h2] == [1]  # epoch 0 skipped on resume
