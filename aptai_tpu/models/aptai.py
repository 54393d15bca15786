"""APTAI — joint tract-variable regression + frame-level phoneme
classification (rebuild of reference models/aptai.py).

Numerical contract (reference models/aptai.py:42-102):
  * TV head: Dropout(0.1) → Tanh → Linear(1024 → 9), then the fixed
    windowed-sinc low-pass (cutoff 10 Hz @ 49 Hz frame rate);
  * phoneme head: Dropout(0.1) → LeakyReLU → Linear(1024 → 46);
  * loss = 0.5·MSE(masked, TV pad −100) + 0.5·CE(masked, ignore_index 0);
  * targets arrive as 9 separate padded arrays stacked in TV_ORDER
    (aptai.py:67-70).

The backbone feature extractor is frozen by default (aptai.py:39-40) and the
final hidden state is the post-LayerNorm encoder output — identical to the
reference's ``hidden_states[24]`` (aptai.py:81; see models/wav2vec2.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from aptai_tpu import FRAME_RATE_HZ, TV_PAD_VALUE
from aptai_tpu.models.configs import Wav2Vec2Config
from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder
from aptai_tpu.ops.fir import fir_lowpass, lowpass_fir_taps

NUM_TVS = 9


def _pad_or_trim(x, t: int, value):
    """Static-width reconciliation along axis 1 (pad with sentinel / trim)."""
    cur = x.shape[1]
    if cur == t:
        return x
    if cur > t:
        return x[:, :t]
    pad = [(0, 0), (0, t - cur)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, constant_values=value)


class APTAI(nn.Module):
    cfg: Wav2Vec2Config
    tv_drop: float = 0.1
    phn_drop: float = 0.1
    num_phonemes: int = 46
    freeze_feature_encoder: bool = True
    lowpass_cutoff_hz: float = 10.0
    frame_rate_hz: float = float(FRAME_RATE_HZ)

    def setup(self):
        self.encoder = Wav2Vec2Encoder(
            self.cfg, freeze_feature_encoder=self.freeze_feature_encoder
        )
        self.tv_dropout = nn.Dropout(self.tv_drop)
        self.tv_linear = nn.Dense(NUM_TVS)
        self.phn_dropout = nn.Dropout(self.phn_drop)
        self.phn_linear = nn.Dense(self.num_phonemes)
        self._taps = lowpass_fir_taps(self.lowpass_cutoff_hz, self.frame_rate_hz)

    def _heads(self, hidden, deterministic):
        tv = self.tv_dropout(hidden, deterministic=deterministic)
        tv = jnp.tanh(tv)
        tv = self.tv_linear(tv.astype(jnp.float32))
        tv = fir_lowpass(tv, self._taps)

        ph = self.phn_dropout(hidden, deterministic=deterministic)
        ph = nn.leaky_relu(ph)
        phn_logits = self.phn_linear(ph.astype(jnp.float32))
        return tv, phn_logits

    def __call__(
        self,
        audio_inputs: jnp.ndarray,      # (B, L)
        audio_lengths: jnp.ndarray,     # (B,)
        phn_frames: jnp.ndarray,        # (B, T) frame phoneme ids, pad 0
        tv_targets: jnp.ndarray,        # (B, T, 9) stacked in TV_ORDER, pad -100
        deterministic: bool = True,
    ):
        hidden, frame_lengths, _ = self.encoder(
            audio_inputs, audio_lengths, deterministic=deterministic
        )
        return self._train_out(hidden, frame_lengths, phn_frames,
                               tv_targets, deterministic)

    def train_from_features(
        self,
        fe_features: jnp.ndarray,       # (B, T, conv_dim) cached FE output
        audio_lengths: jnp.ndarray,     # (B,) audio SAMPLES
        phn_frames: jnp.ndarray,
        tv_targets: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Training forward from cached conv-FE features (train/fe_cache.py)
        — valid because the FE is frozen (reference models/aptai.py:39-40)
        and SpecAugment/dropout all apply post-projection.  Numerically
        identical to ``__call__`` on valid frames (tests/test_fe_cache.py)."""
        hidden, frame_lengths, _ = self.encoder(
            None, audio_lengths, deterministic=deterministic,
            precomputed_features=fe_features,
        )
        return self._train_out(hidden, frame_lengths, phn_frames,
                               tv_targets, deterministic)

    def _train_out(self, hidden, frame_lengths, phn_frames, tv_targets,
                   deterministic):
        # Reconcile the (static) target width with the encoder frame count:
        # bucket-padded audio can yield more frames than the target pad
        # width; the extra frames are padding and carry the mask sentinels.
        t = hidden.shape[1]
        tv_targets = _pad_or_trim(tv_targets, t, TV_PAD_VALUE)
        phn_targets = _pad_or_trim(phn_frames, t, 0)

        tvs_out, phn_logits = self._heads(hidden, deterministic)

        tv_mask = (tv_targets != TV_PAD_VALUE).astype(jnp.float32)
        mse = jnp.sum(tv_mask * (tvs_out - tv_targets) ** 2) / jnp.maximum(
            jnp.sum(tv_mask), 1.0
        )

        phn_mask = (phn_targets != 0).astype(jnp.float32)
        log_probs = jax.nn.log_softmax(phn_logits, axis=-1)
        nll = -jnp.take_along_axis(
            log_probs, phn_targets[:, :, None].astype(jnp.int32), axis=-1
        )[..., 0]
        ce = jnp.sum(phn_mask * nll) / jnp.maximum(jnp.sum(phn_mask), 1.0)

        a = 0.5  # reference models/aptai.py:101
        loss = a * mse + (1 - a) * ce

        phn_fc_pred = jnp.argmax(phn_logits, axis=-1)
        return {
            "loss": loss,
            "mse_loss": mse,
            "ce_loss": ce,
            "tvs_pred": tvs_out,
            "phn_fc_pred": phn_fc_pred,
            "phn_logits": phn_logits,
            "frame_lengths": frame_lengths,
        }

    def predict(
        self,
        audio_inputs: jnp.ndarray,
        audio_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Batched device-side core of ``get_aptai_output``
        (reference models/aptai.py:125-179): per-frame phoneme probabilities
        / argmax and smoothed TV trajectories."""
        hidden, frame_lengths, _ = self.encoder(
            audio_inputs, audio_lengths, deterministic=deterministic
        )
        tvs_out, phn_logits = self._heads(hidden, deterministic)
        phn_probs = jax.nn.softmax(phn_logits, axis=-1)
        return {
            "phn_fc_probs": phn_probs,
            "phn_fc_logits": phn_logits,
            "phn_fc_pred": jnp.argmax(phn_probs, axis=-1),
            "tvs_pred": tvs_out,
            "frame_lengths": frame_lengths,
        }
