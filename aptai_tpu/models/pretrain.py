"""Self-supervised wav2vec2 pretraining objective (TPU-native).

The reference's whole chain STARTS from a speech-pretrained tower —
``Wav2Vec2Model.from_pretrained(...)`` (reference models/w2v2_pr.py:28-33)
— but contains no way to produce one.  This module supplies the missing
capability: the wav2vec2 masked-contrastive objective (Baevski et al.
2020) over the same :class:`~aptai_tpu.models.wav2vec2.Wav2Vec2Encoder`
the downstream models use, so a pretrained tower's ``encoder`` subtree
splices directly into ``W2V2PR`` / ``APTAI`` (train/builders.py).

Objective (per masked frame t):

  * the conv ``extract_features`` are product-quantized by a
    Gumbel-softmax quantizer (G groups × V codevectors, straight-through
    hard samples at temperature τ) into targets ``q_t``;
  * the transformer output at the masked position (mask embedding
    substituted at the input, exactly like SpecAugment) is projected to
    ``c_t``; the InfoNCE loss scores ``cos(c_t, q_t)/κ`` against K
    distractors ``q_{t'}`` drawn from the same utterance;
  * a diversity term pushes codebook usage toward uniform
    (``(GV − perplexity)/GV``), and an L2 penalty keeps the conv features
    bounded (the fairseq ``features_pen``; weight 10 there).

TPU-first deviations from the HF/fairseq implementations (all static
shape, single fused program):

  * the span mask is computed OUTSIDE the model (train/pretrain.py) with
    the same ``_compute_time_mask`` machinery SpecAugment uses, and fed
    through ``Wav2Vec2Encoder(time_mask=...)`` — the HF pretraining
    collator computes it host-side; here it is jit-traced device code;
  * negatives are sampled uniformly from ALL valid frames of the same
    utterance (fairseq's default regime) rather than from the masked
    subset only (HF's choice): uniform-over-valid keeps the sampling a
    fixed-shape gather with no host-side index compaction.  Collisions
    with the positive's codevector are masked to −∞ exactly as in both
    references;
  * losses are means over masked positions (HF sums and rescales by the
    mask count at the batch level — identical gradients up to the global
    scale absorbed by the learning rate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from aptai_tpu.models.configs import Wav2Vec2Config
from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder


class GumbelVectorQuantizer(nn.Module):
    """Product quantizer with Gumbel-softmax straight-through estimation.

    Parameter layout mirrors HF ``Wav2Vec2GumbelVectorQuantizer``
    (``codevectors (1, G·V, d/G)``, ``weight_proj Dense(G·V)``) so a
    future HF export/import maps 1:1.
    """

    num_groups: int = 2
    num_vars: int = 320
    codevector_dim: int = 256

    @nn.compact
    def __call__(self, x, temperature: float, deterministic: bool,
                 pos_mask: Optional[jnp.ndarray] = None):
        """x: (B, T, C) conv features → (quantized (B, T, codevector_dim),
        perplexity scalar).  ``pos_mask`` (B, T) selects the positions the
        perplexity (codebook-usage) statistics average over — the masked
        positions during training, everything valid at eval."""
        b, t, _ = x.shape
        g, v = self.num_groups, self.num_vars
        d_g = self.codevector_dim // g

        codevectors = self.param(
            "codevectors", nn.initializers.uniform(scale=1.0),
            (1, g * v, d_g), jnp.float32)
        logits = nn.Dense(g * v, name="weight_proj",
                          kernel_init=nn.initializers.normal(1.0),
                          bias_init=nn.initializers.zeros)(
            x.astype(jnp.float32))
        logits = logits.reshape(b, t, g, v)

        if deterministic:
            hard = jax.nn.one_hot(jnp.argmax(logits, axis=-1), v,
                                  dtype=jnp.float32)
            probs = hard
        else:
            gumbel = jax.random.gumbel(
                self.make_rng("gumbel"), logits.shape, jnp.float32)
            y_soft = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
            hard = jax.nn.one_hot(jnp.argmax(y_soft, axis=-1), v,
                                  dtype=jnp.float32)
            # straight-through: forward hard, backward soft
            probs = hard + y_soft - jax.lax.stop_gradient(y_soft)

        # codebook-usage perplexity from the (noise-free) marginal softmax
        # over the selected positions, per group, summed (HF convention)
        marg = jax.nn.softmax(logits, axis=-1)  # (B, T, G, V)
        if pos_mask is not None:
            w = pos_mask.astype(jnp.float32)[:, :, None, None]
            denom = jnp.maximum(jnp.sum(w), 1.0)
            mean_probs = jnp.sum(marg * w, axis=(0, 1)) / denom
        else:
            mean_probs = jnp.mean(marg, axis=(0, 1))  # (G, V)
        perplexity = jnp.sum(
            jnp.exp(-jnp.sum(mean_probs * jnp.log(mean_probs + 1e-7),
                             axis=-1)))

        # (B, T, G, V) @ (G, V, d/G) -> (B, T, G, d/G) -> (B, T, d)
        cv = codevectors.reshape(g, v, d_g)
        quantized = jnp.einsum("btgv,gvd->btgd", probs, cv)
        return quantized.reshape(b, t, g * d_g), perplexity


def sample_negative_indices(rng, b: int, t: int, frame_lengths,
                            num_negatives: int):
    """(B, T, K) indices of distractor frames: uniform over the valid
    frames of the same utterance, excluding the position itself (the
    classic sample-from-[0,L-2]-then-shift construction)."""
    lengths = jnp.maximum(frame_lengths.astype(jnp.int32), 2)
    u = jax.random.uniform(rng, (b, t, num_negatives))
    idx = (u * (lengths[:, None, None] - 1).astype(jnp.float32)).astype(
        jnp.int32)  # in [0, L-2]
    pos = jnp.arange(t, dtype=jnp.int32)[None, :, None]
    idx = idx + (idx >= pos)  # skip self -> uniform over [0, L-1] \ {t}
    return jnp.minimum(idx, lengths[:, None, None] - 1)


class Wav2Vec2Pretrain(nn.Module):
    """Masked-contrastive pretraining head over the shared encoder.

    Parameter tree: ``{"encoder": <Wav2Vec2Encoder>, "quantizer": ...,
    "project_hid": ..., "project_q": ...}`` — the ``encoder`` subtree is
    the artifact downstream trainers splice (train/builders.py,
    ``pretrained_checkpoint`` pointing at a pretrain run)."""

    cfg: Wav2Vec2Config
    num_groups: int = 2
    num_vars: int = 320
    codevector_dim: int = 256
    proj_codevector_dim: int = 256
    num_negatives: int = 100
    contrastive_temperature: float = 0.1   # HF contrastive_logits_temperature
    diversity_weight: float = 0.1          # fairseq/HF loss_weights[0]
    feature_penalty_weight: float = 10.0   # fairseq loss_weights[1]

    def setup(self):
        if not self.cfg.apply_spec_augment:
            raise ValueError("pretraining needs cfg.apply_spec_augment "
                             "(the learned mask embedding)")
        self.encoder = Wav2Vec2Encoder(self.cfg)
        self.quantizer = GumbelVectorQuantizer(
            num_groups=self.num_groups, num_vars=self.num_vars,
            codevector_dim=self.codevector_dim)
        self.project_hid = nn.Dense(self.proj_codevector_dim)
        self.project_q = nn.Dense(self.proj_codevector_dim)
        self.dropout_features = nn.Dropout(self.cfg.feat_proj_dropout)

    def __call__(
        self,
        audio_inputs: jnp.ndarray,    # (B, L)
        audio_lengths: jnp.ndarray,   # (B,)
        time_mask: jnp.ndarray,       # (B, T_frames) bool, True = masked
        gumbel_temperature: jnp.ndarray = 2.0,
        deterministic: bool = False,
    ):
        hidden, frame_lengths, extract = self.encoder(
            audio_inputs, audio_lengths, deterministic=deterministic,
            time_mask=time_mask)
        b, t, _ = hidden.shape
        valid = jnp.arange(t)[None, :] < frame_lengths[:, None]
        mask = time_mask[:, :t] & valid

        c = self.project_hid(hidden.astype(jnp.float32))  # (B, T, P)

        extract = extract.astype(jnp.float32)
        feats = self.dropout_features(extract, deterministic=deterministic)
        quantized, perplexity = self.quantizer(
            feats, gumbel_temperature, deterministic,
            pos_mask=mask if not deterministic else valid)
        q = self.project_q(quantized)  # (B, T, P)

        neg_idx = sample_negative_indices(
            self.make_rng("negatives"), b, t, frame_lengths,
            self.num_negatives)
        negs = jnp.take_along_axis(
            q[:, :, None, :], neg_idx[:, :, :, None], axis=1)  # (B,T,K,P)
        cand = jnp.concatenate([q[:, :, None, :], negs], axis=2)  # (B,T,1+K,P)

        # cosine similarity / κ, positive at index 0
        c_n = c / jnp.maximum(
            jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-8)
        cand_n = cand / jnp.maximum(
            jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-8)
        logits = jnp.einsum("btp,btkp->btk", c_n, cand_n)
        logits = logits / self.contrastive_temperature

        # distractors that hit the positive's exact codevector can't count
        # as negatives (HF neg_is_pos masking)
        neg_is_pos = jnp.all(
            jnp.isclose(cand[:, :, 1:], cand[:, :, :1]), axis=-1)
        logits = jnp.concatenate(
            [logits[:, :, :1],
             jnp.where(neg_is_pos, -jnp.inf, logits[:, :, 1:])], axis=2)

        logp = jax.nn.log_softmax(logits, axis=-1)[:, :, 0]  # (B, T)
        n_masked = jnp.maximum(jnp.sum(mask), 1)
        contrastive = -jnp.sum(jnp.where(mask, logp, 0.0)) / n_masked

        gv = self.num_groups * self.num_vars
        diversity = (gv - perplexity) / gv
        feat_pen = jnp.mean(
            jnp.where(valid[:, :, None], extract, 0.0) ** 2)

        loss = (contrastive
                + self.diversity_weight * diversity
                + self.feature_penalty_weight * feat_pen)
        # masked-position top-1 accuracy: the standard pretraining health
        # metric (is the positive winning against the distractors?)
        acc = jnp.sum(
            jnp.where(mask, (jnp.argmax(logits, axis=-1) == 0), False)
        ) / n_masked
        return {
            "loss": loss,
            "contrastive_loss": contrastive,
            "diversity_loss": diversity,
            "feature_penalty": feat_pen,
            "codebook_perplexity": perplexity,
            "contrastive_accuracy": acc,
            "num_masked": jnp.sum(mask),
            "frame_lengths": frame_lengths,
        }
