"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over the
encoder layer stack must match the sequential layer loop — forward and
gradients — and compose with data parallelism.

The reference has no parallelism of any kind (SURVEY.md §2.3); these tests
pin the new first-class multi-chip scope on the virtual 8-device CPU mesh
(tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aptai_tpu.models import Wav2Vec2Encoder, tiny_config
from aptai_tpu.parallel.pipeline import (
    interleaved_layer_order,
    pipelined_encoder_apply,
    schedule_ticks,
    split_layer_params,
    unstack_layer_params,
)


@pytest.fixture(scope="module")
def encoder_setup():
    cfg = tiny_config(num_hidden_layers=4)
    enc = Wav2Vec2Encoder(cfg)
    rng = np.random.default_rng(0)
    b, length = 4, 3200
    audio = jnp.asarray(rng.standard_normal((b, length)).astype(np.float32))
    lens = jnp.asarray(np.array([3200, 2400, 3200, 1600], np.int32))
    variables = enc.init(jax.random.PRNGKey(0), audio, lens)
    ref_h, ref_fl, _ = enc.apply(variables, audio, lens, deterministic=True)
    return enc, variables, audio, lens, ref_h, ref_fl


def _pipe_mesh(n_stages, data=1):
    devs = np.asarray(jax.devices()[: n_stages * data])
    if data > 1:
        return Mesh(devs.reshape(data, n_stages), ("data", "pipe"))
    return Mesh(devs.reshape(n_stages), ("pipe",))


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (4, 4), (2, 4), (1, 2)])
def test_pp_forward_matches_sequential(encoder_setup, n_stages, n_micro):
    enc, variables, audio, lens, ref_h, ref_fl = encoder_setup
    mesh = _pipe_mesh(n_stages)
    with mesh:
        h, fl, _ = pipelined_encoder_apply(
            enc, variables, audio, lens, mesh, num_microbatches=n_micro
        )
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ref_fl))
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(ref_h), atol=1e-5, rtol=1e-5
    )


def test_pp_gradients_match_sequential(encoder_setup):
    enc, variables, audio, lens, _, _ = encoder_setup
    mesh = _pipe_mesh(4)

    def loss_pp(v):
        h, _, _ = pipelined_encoder_apply(
            enc, v, audio, lens, mesh, num_microbatches=2
        )
        return jnp.mean(h**2)

    def loss_ref(v):
        h, _, _ = enc.apply(v, audio, lens, deterministic=True)
        return jnp.mean(h**2)

    with mesh:
        g_pp = jax.grad(loss_pp)(variables)
    g_ref = jax.grad(loss_ref)(variables)
    flat_pp = jax.tree.leaves(g_pp)
    flat_ref = jax.tree.leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_pp_composes_with_data_parallel(encoder_setup):
    """PP×DP mesh (2 data × 4 pipe): microbatch batch dim sharded over
    ``data`` while stages flow over ``pipe``."""
    enc, variables, audio, lens, ref_h, _ = encoder_setup
    mesh = _pipe_mesh(4, data=2)
    with mesh:
        h, _, _ = pipelined_encoder_apply(
            enc, variables, audio, lens, mesh,
            num_microbatches=2, data_axis="data",
        )
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(ref_h), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("n_stages,n_micro,interleave",
                         [(2, 2, 2), (2, 4, 2), (4, 4, 1)])
def test_pp_interleaved_forward_matches_sequential(
        encoder_setup, n_stages, n_micro, interleave):
    """The circular schedule (V layer chunks at stride S per device) is
    numerically the sequential layer loop, like GPipe."""
    enc, variables, audio, lens, ref_h, ref_fl = encoder_setup
    mesh = _pipe_mesh(n_stages)
    with mesh:
        h, fl, _ = pipelined_encoder_apply(
            enc, variables, audio, lens, mesh,
            num_microbatches=n_micro, interleave=interleave,
        )
    np.testing.assert_array_equal(np.asarray(fl), np.asarray(ref_fl))
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(ref_h), atol=1e-5, rtol=1e-5
    )


def test_pp_interleaved_gradients_match_sequential(encoder_setup):
    enc, variables, audio, lens, _, _ = encoder_setup
    mesh = _pipe_mesh(2)

    def loss_pp(v):
        h, _, _ = pipelined_encoder_apply(
            enc, v, audio, lens, mesh, num_microbatches=2, interleave=2
        )
        return jnp.mean(h**2)

    def loss_ref(v):
        h, _, _ = enc.apply(v, audio, lens, deterministic=True)
        return jnp.mean(h**2)

    with mesh:
        g_pp = jax.grad(loss_pp)(variables)
    g_ref = jax.grad(loss_ref)(variables)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_interleaved_layer_order_and_ticks():
    # L=24, S=4, V=2: chunk size 3; device s holds chunks (s, 4+s) ->
    # contiguous shard s covers layers [3s..3s+3) ++ [12+3s..12+3s+3)
    order = interleaved_layer_order(24, 4, 2)
    assert order[:6] == [0, 1, 2, 12, 13, 14]       # device 0
    assert order[6:12] == [3, 4, 5, 15, 16, 17]     # device 1
    assert sorted(order) == list(range(24))
    # V=1 is the identity (GPipe stacking order)
    assert interleaved_layer_order(24, 4, 1) == list(range(24))
    with pytest.raises(ValueError, match="divisible"):
        interleaved_layer_order(24, 4, 5)
    # bubble math: interleave divides the GPipe bubble by V at equal M
    assert schedule_ticks(8, 4, 1) == 11
    assert schedule_ticks(8, 4, 2) == 19  # per-tick work is 1/V
    gpipe_bubble = 3 / 11
    inter_bubble = 3 / 19
    assert abs(inter_bubble - gpipe_bubble / 2) < 0.03


def test_pp_interleaved_rejects_ragged_groups(encoder_setup):
    """interleave > 1 needs microbatches divisible by stages (the grouped
    order is what makes the ring wraparound arrive exactly on time)."""
    enc, variables, audio, lens, *_ = encoder_setup
    mesh = _pipe_mesh(2)
    with pytest.raises(ValueError, match="divisible by stages"):
        with mesh:
            pipelined_encoder_apply(
                enc, variables, audio, lens, mesh,
                num_microbatches=1, interleave=2,  # M=1 < S=2
            )


def test_stack_roundtrip(encoder_setup):
    enc, variables, *_ = encoder_setup
    stacked, rest = split_layer_params(variables["params"])
    assert "layers_0" not in rest and "feature_extractor" in rest
    # every stacked leaf gains a leading layer axis
    n = enc.cfg.num_hidden_layers
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == n
    unstacked = unstack_layer_params(stacked)
    for i in range(n):
        orig = variables["params"][f"layers_{i}"]
        got = unstacked[f"layers_{i}"]
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_rejects_bad_shapes(encoder_setup):
    enc, variables, audio, lens, *_ = encoder_setup
    mesh = _pipe_mesh(4)
    with pytest.raises(ValueError, match="microbatches"):
        with mesh:
            pipelined_encoder_apply(
                enc, variables, audio, lens, mesh, num_microbatches=3
            )
    mesh3 = Mesh(np.asarray(jax.devices()[:3]), ("pipe",))
    with pytest.raises(ValueError, match="stages"):
        with mesh3:
            pipelined_encoder_apply(
                enc, variables, audio, lens, mesh3, num_microbatches=2
            )
