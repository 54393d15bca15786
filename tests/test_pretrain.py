"""Self-supervised pretraining: objective unit tests + trainer smoke +
the pretrained-encoder graft into downstream builders.

The reference has no pretraining (its chain starts at HF
``from_pretrained``, reference models/w2v2_pr.py:28-33); these tests pin
the NEW capability's contract: the wav2vec2 masked-contrastive objective
(models/pretrain.py) and the splice path that makes its towers usable by
every downstream trainer (train/builders.py::_maybe_load_pretrained).
"""

import dataclasses
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.models import tiny_config
from aptai_tpu.models.pretrain import (GumbelVectorQuantizer,
                                       Wav2Vec2Pretrain,
                                       sample_negative_indices)


@pytest.fixture(scope="module")
def pretrain_setup():
    cfg = tiny_config(apply_spec_augment=True)
    model = Wav2Vec2Pretrain(cfg, num_groups=2, num_vars=8,
                             codevector_dim=16, proj_codevector_dim=16,
                             num_negatives=10)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    lengths = jnp.asarray([3200, 2400], np.int32)
    t = int(cfg.feat_extract_output_lengths(np.asarray(3200)))
    mask = jnp.asarray(rng.random((2, t)) < 0.5)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "gumbel": jax.random.PRNGKey(1),
         "negatives": jax.random.PRNGKey(2)},
        audio, lengths, mask, jnp.float32(2.0), deterministic=True)
    return model, variables, audio, lengths, mask


def test_pretrain_forward_and_grads(pretrain_setup):
    model, variables, audio, lengths, mask = pretrain_setup

    out = model.apply(variables, audio, lengths, mask, jnp.float32(2.0),
                      deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(3),
                            "gumbel": jax.random.PRNGKey(4),
                            "negatives": jax.random.PRNGKey(5)})
    for k in ("loss", "contrastive_loss", "diversity_loss",
              "feature_penalty", "codebook_perplexity",
              "contrastive_accuracy"):
        assert np.isfinite(float(out[k])), k
    assert 0.0 <= float(out["contrastive_accuracy"]) <= 1.0
    # perplexity is bounded by the codebook size per group, summed
    assert 0.0 < float(out["codebook_perplexity"]) <= 2 * 8

    def loss_fn(params):
        return model.apply(
            {"params": params}, audio, lengths, mask, jnp.float32(2.0),
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "gumbel": jax.random.PRNGKey(4),
                  "negatives": jax.random.PRNGKey(5)})["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
    # every component learns: encoder, quantizer (via straight-through),
    # and both projection heads get gradient
    for scope in ("encoder", "quantizer", "project_hid", "project_q"):
        total = sum(float(jnp.sum(jnp.abs(g)))
                    for g in jax.tree_util.tree_leaves(grads[scope]))
        assert total > 0, f"no gradient into {scope}"


def test_negative_sampling_excludes_self_and_respects_lengths():
    rng = jax.random.PRNGKey(0)
    b, t, k = 3, 20, 16
    lengths = jnp.asarray([20, 11, 2], np.int32)
    idx = np.asarray(sample_negative_indices(rng, b, t, lengths, k))
    pos = np.arange(t)[None, :, None]
    within = idx < np.asarray(lengths)[:, None, None]
    assert within.all(), "negatives must come from valid frames"
    # self-exclusion holds wherever position < length (the only rows used)
    valid_rows = pos < np.asarray(lengths)[:, None, None]
    assert not np.any((idx == pos) & valid_rows)


def test_quantizer_hard_selection_and_straight_through(rng):
    q = GumbelVectorQuantizer(num_groups=2, num_vars=4, codevector_dim=8)
    x = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
    variables = q.init({"params": jax.random.PRNGKey(0),
                        "gumbel": jax.random.PRNGKey(1)},
                       x, 1.0, True)
    quantized, perplexity = q.apply(variables, x, 1.0, True)
    # deterministic output rows are exact codevector concatenations
    cv = np.asarray(variables["params"]["codevectors"]).reshape(2, 4, 4)
    out = np.asarray(quantized).reshape(6, 2, 4)
    for t in range(6):
        for g in range(2):
            assert any(np.allclose(out[t, g], cv[g, v]) for v in range(4))

    # straight-through: gradients reach weight_proj through the hard sample
    def loss(params):
        qz, _ = q.apply({"params": params}, x, 2.0, False,
                        rngs={"gumbel": jax.random.PRNGKey(2)})
        return jnp.sum(qz ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.sum(jnp.abs(g["weight_proj"]["kernel"]))) > 0


def test_external_time_mask_applies_mask_embedding(rng):
    """Wav2Vec2Encoder(time_mask=...): masked positions get the learned
    embedding exactly like internal SpecAugment; unmasked pass through."""
    from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder

    cfg = tiny_config(apply_spec_augment=True)
    enc = Wav2Vec2Encoder(cfg)
    audio = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    lengths = jnp.asarray([3200], np.int32)
    t = int(cfg.feat_extract_output_lengths(np.asarray(3200)))
    variables = enc.init(jax.random.PRNGKey(0), audio, lengths)

    none_mask = jnp.zeros((1, t), bool)
    all_mask = jnp.ones((1, t), bool)
    h_none, _, _ = enc.apply(variables, audio, lengths, time_mask=none_mask)
    h_all, _, _ = enc.apply(variables, audio, lengths, time_mask=all_mask)
    h_plain, _, _ = enc.apply(variables, audio, lengths)
    np.testing.assert_allclose(np.asarray(h_none), np.asarray(h_plain),
                               atol=1e-6)
    assert np.abs(np.asarray(h_all) - np.asarray(h_none)).max() > 1e-3


@pytest.mark.slow
def test_pretrain_trainer_and_graft(tmp_path):
    """End-to-end: the pretrain CLI runs on a synthetic corpus, its best
    checkpoint grafts into build_pr_model, and the spliced encoder leaves
    equal the pretrained ones (not the fresh init)."""
    from aptai_tpu.data import make_synthetic_commonphone
    from aptai_tpu.train import pretrain
    from aptai_tpu.train.builders import build_pr_model
    from aptai_tpu.train.config import PRConfig

    csv = make_synthetic_commonphone(tmp_path / "cp", 6, 2, 2)
    tiny = tiny_config(apply_spec_augment=True)
    cfg = pretrain.PretrainConfig(
        exp_dir=str(tmp_path / "pre"), audio_csv_path=str(csv),
        num_epochs=2, num_warmup_epochs=1, num_static_epochs=1,
        batch_size=2, learning_rate=1e-4, mesh_data=1,
        codevector_vars=8, codevector_dim=16, proj_codevector_dim=16,
        num_negatives=5,
    ).finalize("pretrain")
    history, final_params = pretrain.run(cfg, tiny_backbone=tiny)
    assert len(history) == 2
    assert np.isfinite(history[-1]["val_loss"])
    assert (tmp_path / "pre" / "best-model-ckpt" / "params.msgpack").exists()

    pr_cfg = PRConfig(
        exp_dir=str(tmp_path / "pr"), cp_csv_path=str(csv),
        hprc_csv_path="", mesh_data=1,
        pretrained_checkpoint=str(tmp_path / "pre"),
    ).finalize("phoneme_recognizer")
    vocab = {"(blank)": 0, "a": 1, "b": 2}
    _, params, _ = build_pr_model(pr_cfg, vocab, tiny=tiny)
    got = np.asarray(jax.tree_util.tree_leaves(
        params["encoder"]["feature_projection"])[0])
    want = np.asarray(jax.tree_util.tree_leaves(
        final_params["encoder"]["feature_projection"])[0])
    # the graft must deliver the TRAINED leaves (best ckpt), which differ
    # from a fresh init; compare against the final params' subtree shape
    assert got.shape == want.shape
    fresh_cfg = dataclasses.replace(pr_cfg, pretrained_checkpoint=None)
    _, fresh_params, _ = build_pr_model(fresh_cfg, vocab, tiny=tiny)
    fresh = np.asarray(jax.tree_util.tree_leaves(
        fresh_params["encoder"]["feature_projection"])[0])
    assert np.abs(got - fresh).max() > 0, "graft did not replace the init"
