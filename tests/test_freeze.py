"""Optimizer-level freeze guarantee for FORCE-APTAI (VERDICT r1 weak #3).

The reference trains only the ~0.5 M-param head over a frozen PR tower
(reference models/force_aptai.py:76-78, requires_grad=False).  Here the
``w2v2_pr`` subtree is excluded from the optimizer via ``optax.masked``:
no Adam moments are allocated for it, and even a nonzero weight decay can
never touch it."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aptai_tpu.models import ForceAPTAI, tiny_config
from aptai_tpu.train.harness import (
    create_train_state,
    make_train_step,
    torch_adam,
    trainable_mask,
)


@pytest.fixture(scope="module")
def force_setup():
    cfg = tiny_config()
    model = ForceAPTAI(cfg, vocab_size=cfg.vocab_size)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
    lengths = jnp.asarray(np.array([3200, 2400], np.int32))
    t = int(cfg.feat_extract_output_lengths(np.asarray(3200)))
    tvs = jnp.asarray(rng.standard_normal((2, t, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, lengths, tvs)
    batch = {"audio": audio, "audio_lengths": lengths, "tv_targets": tvs}
    # host copies: the train step donates its input state, which would
    # delete device buffers shared with this module-scoped fixture
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    return model, params, batch


def _loss_fn(model):
    def loss_fn(params, batch, rngs):
        out = model.apply(
            {"params": params}, batch["audio"], batch["audio_lengths"],
            batch["tv_targets"], deterministic=False, rngs=rngs,
        )
        return out["loss"], {}

    return loss_fn


def test_frozen_backbone_bit_identical_under_weight_decay(force_setup):
    model, params, batch = force_setup
    # nonzero weight decay is exactly the hazard: an unmasked
    # add_decayed_weights would decay the frozen tower every step
    optimizer = torch_adam(weight_decay=0.01, frozen_prefixes=("w2v2_pr",))
    state = create_train_state(jax.tree.map(jnp.asarray, params), optimizer)
    step = make_train_step(_loss_fn(model), optimizer)

    before = params["w2v2_pr"]
    head_before = params["rnn"]
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(1),
                              jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree.map(np.asarray, state.params["w2v2_pr"])
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(before),
        jax.tree_util.tree_leaves_with_path(after),
    ):
        np.testing.assert_array_equal(
            a, b, err_msg=f"frozen param changed: {kp}"
        )

    # ... while the head does train
    head_after = jax.tree.map(np.asarray, state.params["rnn"])
    moved = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(head_before),
                        jax.tree_util.tree_leaves(head_after))
    )
    assert moved > 0


def test_opt_state_carries_no_backbone_moments(force_setup):
    model, params, batch = force_setup
    optimizer = torch_adam(weight_decay=0.01, frozen_prefixes=("w2v2_pr",))
    opt_state = optimizer.init(params)
    paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(opt_state)
    ]
    assert paths, "opt state unexpectedly empty"
    assert not any("w2v2_pr" in p for p in paths), (
        "frozen backbone still has optimizer state: "
        + next(p for p in paths if "w2v2_pr" in p)
    )
    # moments exist for the trainable head
    assert any("rnn" in p for p in paths)

    # sanity on the mask itself
    mask = trainable_mask(params, ("w2v2_pr",))
    assert not any(jax.tree_util.tree_leaves(mask["w2v2_pr"]))
    assert all(jax.tree_util.tree_leaves(mask["rnn"]))


def test_unmasked_adam_matches_optax_reference(force_setup):
    """torch_adam without frozen prefixes must stay plain Adam."""
    _, params, _ = force_setup
    tx = torch_adam()
    grads = jax.tree.map(jnp.ones_like, params)
    st = tx.init(params)
    up, _ = tx.update(grads, st, params)
    ref = optax.scale_by_adam()
    ref_up, _ = ref.update(grads, ref.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(up),
                    jax.tree_util.tree_leaves(ref_up)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
