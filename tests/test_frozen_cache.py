"""Frozen-tower encoding cache (train/frozen_cache.py): the FORCE trainer
encodes each utterance ONCE and trains the head from cached encodings.
These tests pin that the cached step is numerically the direct step and
that both decode modes cache correctly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.models import ForceAPTAI, tiny_config
from aptai_tpu.train.frozen_cache import FrozenEncodedLoader


class _OneBatchLoader:
    def __init__(self, batch, batch_size):
        self.batch = batch
        self.batch_size = batch_size

    def __len__(self):
        return 1

    def __iter__(self):
        return iter([self.batch])


@pytest.fixture(scope="module", params=["greedy", "beam_host"])
def setup(request):
    cfg = tiny_config()
    model = ForceAPTAI(cfg, vocab_size=cfg.vocab_size,
                       decode_method=request.param,
                       allow_host_callback_decode=True)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((3, 4800)).astype(np.float32)
    lengths = np.array([4800, 3200, 2400], np.int32)
    t = int(cfg.feat_extract_output_lengths(np.asarray(4800)))
    tvs = rng.standard_normal((3, t, 9)).astype(np.float32)
    tvs[2, t // 2:] = -100.0  # padded TV tail on the short item
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                           jnp.asarray(lengths), jnp.asarray(tvs))
    batch = {
        "audio": audio,
        "audio_lengths": lengths,
        "tv_targets": tvs,
        "phoneme_labels": np.array(
            [[1, 2, -100, -100], [2, 3, 4, -100], [1, -100, -100, -100]],
            np.int32),
        "batch_pad_mask": np.ones(3, bool),
    }
    return model, variables["params"], batch


def test_cached_step_matches_direct_step(setup):
    """Loss and TV predictions from a cached-encodings batch must equal the
    direct full forward (same params, deterministic) within the audio
    -bucketing float tolerance."""
    model, params, batch = setup
    want = model.apply({"params": params}, jnp.asarray(batch["audio"]),
                       jnp.asarray(batch["audio_lengths"]),
                       jnp.asarray(batch["tv_targets"]))

    loader = FrozenEncodedLoader(
        _OneBatchLoader(batch, batch_size=3), model, params, shuffle=False)
    assert len(loader.dataset) == 3
    # every utterance served exactly once per epoch despite frame-width
    # bucketing splitting them across batches
    served = sum(int(b["batch_pad_mask"].sum()) for b in loader)
    assert served == 3
    # head forward over the cached items collated in insertion order (the
    # original batch row order) — numerics vs the direct full forward
    from aptai_tpu.train.frozen_cache import collate_encoded

    enc_batch = collate_encoded(loader.dataset.items)
    got = model.apply(
        {"params": params}, jnp.asarray(enc_batch["frame_embs"]),
        jnp.asarray(enc_batch["enc_frame_lengths"]),
        jnp.asarray(enc_batch["phn_pred_seq"]),
        jnp.asarray(enc_batch["phn_seq_lengths"]),
        jnp.asarray(enc_batch["phn_seq_truncated"]),
        jnp.asarray(enc_batch["tv_targets"]),
        method="train_from_encoded",
    )
    np.testing.assert_array_equal(np.asarray(want["pred_ctc_phn_seq"]),
                                  np.asarray(got["pred_ctc_phn_seq"]))
    # the cache pass is jitted, the reference forward here is eager: XLA
    # fuses the LN/softmax reductions differently, and the ForwardSum
    # log-semiring amplifies that to ~1e-4 relative on the scalar loss
    np.testing.assert_allclose(float(want["loss"]), float(got["loss"]),
                               rtol=5e-4)
    fl = np.asarray(want["frame_lengths"])
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(want["tvs_pred"])[b, : fl[b]],
            np.asarray(got["tvs_pred"])[b, : fl[b]],
            rtol=1e-4, atol=1e-5)


def test_cache_skips_repeat_padded_rows(setup):
    """A partial batch's repeat-padded rows (batch_pad_mask False) must not
    enter the cache as duplicate utterances."""
    model, params, batch = setup
    dup = dict(batch)
    dup["batch_pad_mask"] = np.array([True, True, False])
    loader = FrozenEncodedLoader(
        _OneBatchLoader(dup, batch_size=3), model, params, shuffle=False)
    assert len(loader.dataset) == 2


def test_cached_trainer_end_to_end(tmp_path_factory):
    """The default FORCE trainer path (cache ON) completes a fold and the
    per-epoch train loop never touches the tower: epochs after the cache
    build run head-only batches."""
    from aptai_tpu.data import make_synthetic_hprc
    from aptai_tpu.train import train_force_aptai
    from aptai_tpu.train.config import ForceAPTAIConfig

    root = tmp_path_factory.mktemp("frozen_cache_e2e")
    hprc_csv = make_synthetic_hprc(root / "hprc", utts_per_speaker=2,
                                   cfg=tiny_config())
    cfg = ForceAPTAIConfig(
        exp_dir=str(root / "run"),
        hprc_csv_path=str(hprc_csv),
        vocab_path=str(root / "missing.json"),
        pr_model_path=str(root / "no-pr-ckpt"),
        laptop=True,
        batch_size=2,
        learning_rate=1e-4,
        train_val_rate="both",
        mesh_data=1,
    ).finalize("FORCE_APTAI")
    assert cfg.cache_frozen_encodings  # the default
    mean, _, _ = train_force_aptai.run(cfg, tiny_backbone=tiny_config(),
                                       speakers=["M01"])
    assert np.isfinite(mean["test_N_mean_rmse"])

    # per-epoch saves are head-only (the ~tower-sized write would dominate
    # the cached epoch), but the PUBLIC best checkpoint must finalize to a
    # standard full-model artifact containing the tower
    from pathlib import Path

    from flax import serialization

    best = (Path(cfg.exp_dir) / "best-model-ckpt-M01" / "best-model-ckpt"
            / "params.msgpack")
    tree = serialization.msgpack_restore(best.read_bytes())
    assert "w2v2_pr" in tree and "rnn" in tree and "xatt" in tree


def test_corpus_cache_shared_across_folds(tmp_path_factory):
    """FrozenEncodedCorpus encodes the manifest once; fold loaders drawn
    from it serve exactly their subset, with encodings matching a per-fold
    FrozenEncodedLoader built over the same rows."""
    from aptai_tpu.data import make_synthetic_hprc
    from aptai_tpu.data.hprc import HPRCDataset
    from aptai_tpu.data.vocab import build_vocab
    from aptai_tpu.data.batching import BucketedLoader, collate_tv
    from aptai_tpu.train.frozen_cache import FrozenEncodedCorpus
    import pandas as pd

    root = tmp_path_factory.mktemp("corpus_cache")
    cfg = tiny_config()
    csv = make_synthetic_hprc(root / "hprc", utts_per_speaker=2, cfg=cfg)
    df = pd.read_csv(csv)
    vocab = build_vocab(df.phoneme_labels)
    model = ForceAPTAI(cfg, vocab_size=len(vocab))
    ds = HPRCDataset(df, vocab, rate="both")
    item = ds[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(item["audio"][None]),
        jnp.asarray(np.array([item["audio_len"]], np.int32)),
        jnp.zeros((1, 50, 9)))
    params = variables["params"]

    corpus = FrozenEncodedCorpus(df, vocab, model, params, batch_size=2)
    assert len(corpus) == len(df)

    sub = df[df.speaker == "M01"]
    fold_dl = corpus.loader_for(sub, batch_size=2, shuffle=False)
    served = sum(int(b["batch_pad_mask"].sum()) for b in fold_dl)
    assert served == len(sub)

    # per-fold loader over the same rows produces the same encodings
    per_fold = FrozenEncodedLoader(
        BucketedLoader(HPRCDataset(sub, vocab, rate="both"), 2, collate_tv,
                       shuffle=False),
        model, params, shuffle=False)
    # match per-fold items to corpus items by their exact TV target bytes
    # (the targets pass through both paths unchanged and identify the
    # utterance uniquely — frame lengths alone can collide)
    by_tv = {np.asarray(it["tv_targets"], np.float32).tobytes(): it
             for it in (corpus.by_key[str(p)] for p in sub.path_wav)}
    matched = 0
    for it in per_fold.dataset.items:
        twin = by_tv[np.asarray(it["tv_targets"], np.float32).tobytes()]
        matched += 1
        np.testing.assert_allclose(
            np.asarray(it["frame_embs"], np.float32),
            np.asarray(twin["frame_embs"], np.float32),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(it["phn_pred_seq"],
                                      twin["phn_pred_seq"])
    assert matched == len(sub)
