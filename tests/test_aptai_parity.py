"""Full-model numerical parity: APTAI forward vs a faithful torch replica of
reference models/aptai.py (HF Wav2Vec2Model backbone + Tanh/LeakyReLU heads +
FIR smoothing + masked 0.5·MSE + 0.5·CE), with weights converted through
hf_convert.  This is the output-fidelity guarantee behind the EMA-Pearson
parity target (BASELINE.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
import transformers

from aptai_tpu import TV_PAD_VALUE
from aptai_tpu.models import APTAI, Wav2Vec2Config, convert_wav2vec2_encoder
from aptai_tpu.ops.fir import lowpass_fir_taps

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
NUM_PHN = 11


class TorchAPTAI(torch.nn.Module):
    """Line-faithful port of reference models/aptai.py:42-102 (eval mode)."""

    def __init__(self, hf_cfg):
        super().__init__()
        torch.manual_seed(0)
        self.wav2vec2 = transformers.Wav2Vec2Model(hf_cfg)
        self.tv_head = torch.nn.Sequential(
            torch.nn.Dropout(0.0), torch.nn.Tanh(),
            torch.nn.Linear(TINY["hidden_size"], 9),
        )
        taps = lowpass_fir_taps(10, 49)
        self.register_buffer(
            "fir", torch.tensor(taps, dtype=torch.float64).view(1, 1, -1)
        )
        self.phn_head = torch.nn.Sequential(
            torch.nn.Dropout(0.0), torch.nn.LeakyReLU(),
            torch.nn.Linear(TINY["hidden_size"], NUM_PHN),
        )

    def lowpass(self, y):
        # reference models/modules.py:46-61 (per-channel double conv)
        y = y.double()
        B, L, C = y.shape
        out = torch.zeros(B, L, C)
        for i in range(C):
            traj = y[:, :, i].view(B, 1, L)
            sm = torch.nn.functional.conv1d(traj, self.fir, padding="same")
            out[:, :, i] = sm.view(B, L)
        return out.float()

    def forward(self, audio, lengths, phn_targets, tv_targets):
        attn = torch.zeros_like(audio, dtype=torch.long)
        for b, n in enumerate(lengths):
            attn[b, :n] = 1
        out = self.wav2vec2(audio, attention_mask=attn, return_dict=True,
                            output_hidden_states=True)
        hidden = out.hidden_states[TINY["num_hidden_layers"]]
        tvs = self.lowpass(self.tv_head(hidden))
        logits = self.phn_head(hidden)

        tv_mask = tv_targets != TV_PAD_VALUE
        mse = F.mse_loss(tvs[tv_mask], tv_targets[tv_mask])
        ce = F.cross_entropy(
            logits.view(-1, NUM_PHN)[(phn_targets != 0).flatten()],
            phn_targets.flatten()[(phn_targets != 0).flatten()].long(),
            ignore_index=0,
        )
        return {"tvs": tvs, "logits": logits, "mse": mse, "ce": ce,
                "loss": 0.5 * mse + 0.5 * ce}


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.Wav2Vec2Config(
        **TINY, num_feat_extract_layers=3, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True, hidden_act="gelu",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )
    tm = TorchAPTAI(hf_cfg)
    tm.eval()

    cfg = Wav2Vec2Config(
        **TINY, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, final_dropout=0.0,
        apply_spec_augment=False,
    )
    model = APTAI(cfg, num_phonemes=NUM_PHN, tv_drop=0.0, phn_drop=0.0,
                  freeze_feature_encoder=True)
    enc_params = convert_wav2vec2_encoder(tm.wav2vec2.state_dict(),
                                          cfg.num_hidden_layers)
    # heads
    params = {
        "encoder": enc_params,
        "tv_linear": {
            "kernel": tm.tv_head[2].weight.detach().numpy().T,
            "bias": tm.tv_head[2].bias.detach().numpy(),
        },
        "phn_linear": {
            "kernel": tm.phn_head[2].weight.detach().numpy().T,
            "bias": tm.phn_head[2].bias.detach().numpy(),
        },
    }
    return tm, model, {"params": params}


def test_aptai_full_forward_parity(pair, rng):
    tm, model, variables = pair
    B, L = 2, 4000
    audio = rng.standard_normal((B, L)).astype(np.float32) * 0.1
    audio[1, 2500:] = 0.0
    lengths = np.array([4000, 2500], np.int32)
    t = int(model.cfg.feat_extract_output_lengths(np.asarray(L)))
    phn = rng.integers(0, NUM_PHN, size=(B, t)).astype(np.int32)
    tv = rng.standard_normal((B, t, 9)).astype(np.float32)
    # realistic padding semantics: sentinels beyond item 1's true frames
    t_valid_1 = int(model.cfg.feat_extract_output_lengths(np.asarray(2500)))
    tv[1, t_valid_1:] = TV_PAD_VALUE
    phn[1, t_valid_1:] = 0

    with torch.no_grad():
        want = tm(torch.tensor(audio), lengths, torch.tensor(phn),
                  torch.tensor(tv))

    got = model.apply(variables, jnp.asarray(audio), jnp.asarray(lengths),
                      jnp.asarray(phn), jnp.asarray(tv))

    t_valid = int(model.cfg.feat_extract_output_lengths(np.asarray(2500)))
    # predictions: full frames for item 0; valid frames for item 1
    np.testing.assert_allclose(np.asarray(got["tvs_pred"])[0],
                               want["tvs"].numpy()[0], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["tvs_pred"])[1, :t_valid],
                               want["tvs"].numpy()[1, :t_valid],
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got["phn_logits"])[0],
                               want["logits"].numpy()[0],
                               rtol=1e-3, atol=2e-4)
    # NOTE: losses include padded-region frames for item 1 on both sides
    # (identical masking semantics), so they must agree too.
    assert float(got["mse_loss"]) == pytest.approx(float(want["mse"]),
                                                   rel=2e-3)
    assert float(got["ce_loss"]) == pytest.approx(float(want["ce"]), rel=2e-3)
    assert float(got["loss"]) == pytest.approx(float(want["loss"]), rel=2e-3)


def test_aptai_pearson_parity_on_trajectories(pair, rng):
    """The headline parity metric: per-TV Pearson r between the two
    implementations' predicted trajectories ≈ 1."""
    from scipy.stats import pearsonr

    tm, model, variables = pair
    audio = rng.standard_normal((1, 6400)).astype(np.float32) * 0.1
    lengths = np.array([6400], np.int32)
    t = int(model.cfg.feat_extract_output_lengths(np.asarray(6400)))
    phn = np.ones((1, t), np.int32)
    tv = np.zeros((1, t, 9), np.float32)

    with torch.no_grad():
        want = tm(torch.tensor(audio), lengths, torch.tensor(phn),
                  torch.tensor(tv))["tvs"].numpy()[0]
    got = np.asarray(model.apply(
        variables, jnp.asarray(audio), jnp.asarray(lengths),
        jnp.asarray(phn), jnp.asarray(tv))["tvs_pred"])[0]

    for i in range(9):
        r = pearsonr(got[:, i], want[:, i])[0]
        assert r > 0.99999, (i, r)
