"""W2V2PR — wav2vec2 CTC phoneme recognizer (rebuild of reference
models/w2v2_pr.py).

Training forward returns the same dict contract as the reference
(``loss`` / ``phoneme_logits`` / ``log_probs`` / ``hidden_states``,
reference models/w2v2_pr.py:83-88) with the CTC loss semantics of
``F.ctc_loss(blank=0, reduction='mean', zero_infinity=True)``
(w2v2_pr.py:73-81).  Target lengths are counted as #labels ≥ 0 with pad −100
(w2v2_pr.py:62-70).

Inference helpers (the reference's ``get_embeddings`` /
``get_ctc_logits`` / ``predict_phonemes_durations`` / ``pred_phn_seq``,
w2v2_pr.py:124-277) live in :mod:`aptai_tpu.infer.api`, built on the
on-device ``encode`` method here plus the decoders in
:mod:`aptai_tpu.decode` — batched and jit-compiled instead of the
reference's eager batch-1 CPU round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from aptai_tpu.models.configs import Wav2Vec2Config
from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder
from aptai_tpu.ops.ctc import ctc_loss


class W2V2PR(nn.Module):
    cfg: Wav2Vec2Config
    freeze_feature_encoder: bool = False

    def setup(self):
        self.encoder = Wav2Vec2Encoder(
            self.cfg, freeze_feature_encoder=self.freeze_feature_encoder
        )
        self.pr_head = nn.Dense(self.cfg.vocab_size)
        self.final_dropout = nn.Dropout(self.cfg.final_dropout)

    def __call__(
        self,
        input_values: jnp.ndarray,       # (B, L)
        input_lengths: jnp.ndarray,      # (B,)
        phoneme_labels: jnp.ndarray,     # (B, S) padded with -100
        deterministic: bool = True,
    ):
        hidden, frame_lengths, _ = self.encoder(
            input_values, input_lengths, deterministic=deterministic
        )
        return self._ctc_out(hidden, frame_lengths, phoneme_labels,
                             deterministic)

    def train_from_features(
        self,
        fe_features: jnp.ndarray,        # (B, T, conv_dim) cached FE output
        input_lengths: jnp.ndarray,      # (B,) audio SAMPLES
        phoneme_labels: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Training forward from cached conv-FE features (train/fe_cache.py;
        valid under ``freeze_feature_encoder`` + no cropping — the FE output
        is then constant per utterance).  Numerically identical to
        ``__call__`` on valid frames (tests/test_fe_cache.py)."""
        hidden, frame_lengths, _ = self.encoder(
            None, input_lengths, deterministic=deterministic,
            precomputed_features=fe_features,
        )
        return self._ctc_out(hidden, frame_lengths, phoneme_labels,
                             deterministic)

    def _ctc_out(self, hidden, frame_lengths, phoneme_labels, deterministic):
        hidden = self.final_dropout(hidden, deterministic=deterministic)
        logits = self.pr_head(hidden)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        target_lengths = jnp.sum(phoneme_labels >= 0, axis=-1).astype(jnp.int32)
        targets = jnp.maximum(phoneme_labels, 0).astype(jnp.int32)

        loss = ctc_loss(
            log_probs,
            frame_lengths,
            targets,
            target_lengths,
            blank=self.cfg.blank_id,
            reduction=self.cfg.ctc_loss_reduction,
            zero_infinity=self.cfg.ctc_zero_infinity,
        )
        return {
            "loss": loss,
            "phoneme_logits": logits,
            "log_probs": log_probs,
            "hidden_states": hidden,
            "frame_lengths": frame_lengths,
        }

    def encode_layers(
        self,
        input_values: jnp.ndarray,
        input_lengths: jnp.ndarray,
        intermediate_hidden: int = 12,
        latter_hidden: int = 20,
        deterministic: bool = True,
    ):
        """Multi-layer probing — the reference's ``get_embeddings_grad``
        (models/w2v2_pr.py:91-121): logits from the final, an intermediate,
        and a latter layer's hidden states (HF hidden_states indexing)."""
        hidden, frame_lengths, extract_features, all_hidden = self.encoder(
            input_values, input_lengths, deterministic=deterministic,
            output_hidden_states=True,
        )
        inter = all_hidden[intermediate_hidden]
        latter = all_hidden[latter_hidden]
        return {
            "features_hidden": extract_features,
            "last_transf_hidden": hidden,
            "phoneme_logits_last": self.pr_head(hidden),
            "phoneme_logits_inter": self.pr_head(inter),
            "phoneme_logits_latter": self.pr_head(latter),
            "intermediate_hidden": inter,
            "latter_hidden": latter,
            "frame_lengths": frame_lengths,
        }

    def encode(
        self,
        input_values: jnp.ndarray,
        input_lengths: jnp.ndarray,
        deterministic: bool = True,
    ):
        """Backbone features + CTC logits (the device-side core of the
        reference's ``get_embeddings``, w2v2_pr.py:124-167 — without the
        host beam-decode; see aptai_tpu.decode)."""
        hidden, frame_lengths, extract_features = self.encoder(
            input_values, input_lengths, deterministic=deterministic
        )
        logits = self.pr_head(hidden)
        return {
            "features_hidden": extract_features,
            "last_transf_hidden": hidden,
            "phoneme_logits": logits,
            "frame_lengths": frame_lengths,
        }
