"""Output parity: Flax Wav2Vec2Encoder + converter vs torch transformers
Wav2Vec2Model (random init, no network).  A silent transpose error in the
conversion would destroy the EMA-Pearson parity target (SURVEY.md §7.3
item 3) — this test is the guard."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import transformers

from aptai_tpu.models import (
    Wav2Vec2Config,
    Wav2Vec2Encoder,
    convert_wav2vec2_encoder,
)

TINY = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=48,
    conv_dim=(16, 16, 16),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _torch_model():
    hf_cfg = transformers.Wav2Vec2Config(
        **TINY,
        num_feat_extract_layers=3,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = transformers.Wav2Vec2Model(hf_cfg)
    model.eval()
    return model


def _flax_setup():
    cfg = Wav2Vec2Config(
        **TINY,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        apply_spec_augment=False,
    )
    return cfg, Wav2Vec2Encoder(cfg)


@pytest.fixture(scope="module")
def models():
    tm = _torch_model()
    cfg, enc = _flax_setup()
    params = convert_wav2vec2_encoder(tm.state_dict(), cfg.num_hidden_layers)
    return tm, cfg, enc, {"params": params}


def test_full_length_outputs_match(models, rng):
    tm, cfg, enc, variables = models
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).last_hidden_state.numpy()
    got, frame_lengths, _ = enc.apply(variables, jnp.asarray(x))
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_padded_outputs_match_with_length_mask(models, rng):
    tm, cfg, enc, variables = models
    lengths = np.array([4000, 2600], np.int32)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    x[1, 2600:] = 0.0

    # torch: proper frame-level attention mask
    attn = torch.zeros((2, 4000), dtype=torch.long)
    attn[0, :4000] = 1
    attn[1, :2600] = 1
    with torch.no_grad():
        want = tm(torch.tensor(x), attention_mask=attn).last_hidden_state.numpy()

    got, frame_lengths, _ = enc.apply(
        variables, jnp.asarray(x), jnp.asarray(lengths)
    )
    got = np.asarray(got)
    fl = np.asarray(frame_lengths)
    want_fl = tm._get_feat_extract_output_lengths(torch.tensor(lengths)).numpy()
    np.testing.assert_array_equal(fl, want_fl)
    for b in range(2):
        np.testing.assert_allclose(
            got[b, : fl[b]], want[b, : fl[b]], rtol=1e-3, atol=2e-4
        )


def test_feat_extract_output_lengths_formula(models):
    tm, cfg, enc, _ = models
    lens = np.array([400, 1234, 16000, 153])
    want = tm._get_feat_extract_output_lengths(torch.tensor(lens)).numpy()
    got = np.asarray(cfg.feat_extract_output_lengths(jnp.asarray(lens)))
    np.testing.assert_array_equal(got, want)


def test_extract_features_match(models, rng):
    tm, cfg, enc, variables = models
    x = rng.standard_normal((1, 2000)).astype(np.float32)
    with torch.no_grad():
        want = tm.feature_extractor(torch.tensor(x)).transpose(1, 2).numpy()
    _, _, got = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_fused_qkv_matches_unfused(models, rng):
    """fused_qkv=True + fused conversion == the unfused model."""
    import dataclasses

    tm, cfg, enc, variables = models
    from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder

    cfg_f = dataclasses.replace(cfg, fused_qkv=True)
    enc_f = Wav2Vec2Encoder(cfg_f)
    params_f = convert_wav2vec2_encoder(
        tm.state_dict(), cfg.num_hidden_layers, fused_qkv=True
    )
    x = rng.standard_normal((1, 3200)).astype(np.float32)
    want, _, _ = enc.apply(variables, jnp.asarray(x))
    got, _, _ = enc_f.apply({"params": params_f}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Full production topology (VERDICT r1 missing #1): 24×1024, 16 heads,
# FFN 4096, 7-conv FE, 16-group weight-normalized k=128 pos-conv — the
# wav2vec2-large-robust shape the reference actually trains
# (reference models/w2v2_pr.py:28-33, train/start_train_phoneme_recognizer.sh).
# ---------------------------------------------------------------------------

def _speechlike_wave(n: int, fs: int = 16000) -> np.ndarray:
    """Synthetic-but-structured speech-like waveform: a 120 Hz glottal
    harmonic stack shaped by moving formants + a fricative noise burst —
    much closer to real speech statistics than white noise."""
    t = np.arange(n) / fs
    f0 = 120.0 + 20.0 * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    voiced = sum(np.sin(k * phase) / k for k in range(1, 9))
    # formant-ish AM envelopes
    voiced *= 0.5 + 0.5 * np.sin(2 * np.pi * 4.0 * t) ** 2
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(n) * (t > 0.6 * t[-1])  # trailing fricative
    wav = 0.8 * voiced + 0.15 * noise
    return (wav / np.abs(wav).max()).astype(np.float32)


@pytest.mark.slow
def test_full_scale_conversion_parity(rng):
    """Convert a full-topology random transformers state_dict and assert
    ≤1e-3 parity of the final hidden state on a speech-like waveform."""
    full = Wav2Vec2Config(
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, apply_spec_augment=False,
    )
    hf_cfg = transformers.Wav2Vec2Config(
        hidden_size=full.hidden_size,
        num_hidden_layers=full.num_hidden_layers,
        num_attention_heads=full.num_attention_heads,
        intermediate_size=full.intermediate_size,
        conv_dim=list(full.conv_dim),
        conv_kernel=list(full.conv_kernel),
        conv_stride=list(full.conv_stride),
        num_feat_extract_layers=len(full.conv_dim),
        num_conv_pos_embeddings=full.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=full.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_act="gelu",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2Model(hf_cfg)
    tm.eval()
    # sanity: this really is the production scale (~315 M params)
    n_params = sum(p.numel() for p in tm.parameters())
    assert n_params > 3e8

    enc = Wav2Vec2Encoder(full)
    params = convert_wav2vec2_encoder(tm.state_dict(),
                                      full.num_hidden_layers)

    x = np.stack([_speechlike_wave(6400),
                  np.zeros(6400, np.float32)])
    x[1, :4000] = _speechlike_wave(4000) * 0.5
    lengths = np.array([6400, 4000], np.int32)

    attn = torch.zeros((2, 6400), dtype=torch.long)
    attn[0] = 1
    attn[1, :4000] = 1
    with torch.no_grad():
        want = tm(torch.tensor(x), attention_mask=attn).last_hidden_state.numpy()
    got, frame_lengths, _ = enc.apply({"params": params}, jnp.asarray(x),
                                      jnp.asarray(lengths))
    got, fl = np.asarray(got), np.asarray(frame_lengths)
    want_fl = tm._get_feat_extract_output_lengths(torch.tensor(lengths)).numpy()
    np.testing.assert_array_equal(fl, want_fl)
    for b in range(2):
        g, w = got[b, : fl[b]], want[b, : fl[b]]
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-3)
        # EMA-Pearson-style check: per-channel correlation ≈ 1
        gc = g - g.mean(0)
        wc = w - w.mean(0)
        r = (gc * wc).sum(0) / np.maximum(
            np.sqrt((gc * gc).sum(0) * (wc * wc).sum(0)), 1e-12)
        assert r.min() > 0.99999
