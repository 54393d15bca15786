"""Reusable head modules (Flax) — rebuilt counterparts of the reference's
``models/modules.py``.

* :class:`CrossAttention` — frame↔phoneme additive-masked attention
  (reference models/modules.py:129-153).
* :func:`sinusoidal_positional_encoding` + :class:`PhonemeEncoder` —
  embedding + sinusoidal PE for decoded phoneme sequences
  (reference models/modules.py:217-235, force_aptai.py:47-56).
* :class:`RNNHead` — BiLSTM + MLP tract-variable regressor
  (reference models/modules.py:190-214) on top of the length-masked
  ``ops.lstm`` scan.
* :class:`ConvBank` — conv-bank phoneme classifier; defined-but-unused in
  the reference (models/modules.py:156-187), included for API parity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from aptai_tpu.ops.lstm import LSTMParams, bilstm


class CrossAttention(nn.Module):
    """Q = frame projection, K = phoneme projection, additive −1000 pad mask.

    Returns ``(att_out, energy)`` where
    ``att_out = LayerNorm([softmax(energy+mask)·K ‖ Q])`` — the contract of
    reference models/modules.py:139-153.
    """

    att_dim: int = 128

    @nn.compact
    def __call__(self, frame_hidden, phn_hidden, phn_mask):
        q = nn.Dense(self.att_dim, name="q")(frame_hidden)   # (B, T, A)
        k = nn.Dense(self.att_dim, name="k")(phn_hidden)     # (B, N, A)
        energy = jnp.einsum("bta,bna->btn", q, k)
        att_mask = (1.0 - phn_mask.astype(energy.dtype)) * -1000.0
        energy = energy + att_mask[:, None, :]
        att = jax.nn.softmax(energy, axis=-1)
        att_out = jnp.einsum("btn,bna->bta", att, k)
        att_out = jnp.concatenate([att_out, q], axis=-1)
        att_out = nn.LayerNorm(name="layer_norm")(att_out)
        return att_out, energy


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) sin/cos table (reference models/modules.py:222-227)."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(
        np.arange(0, d_model, 2).astype(np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class PhonemeEncoder(nn.Module):
    """Embedding (padding_idx 0 → zero row) + sinusoidal PE + dropout.

    Mirrors ``phn_emb_layer`` + ``pe_phn`` (reference models/force_aptai.py:47-56):
    the embedding row for the pad/blank id 0 is pinned at zero, like torch
    ``nn.Embedding(padding_idx=0)``.
    """

    vocab_size: int
    dim: int = 128
    max_len: int = 60
    dropout: float = 0.2

    @nn.compact
    def __call__(self, phn_ids, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.dim, name="embed")(phn_ids)
        emb = jnp.where((phn_ids == 0)[:, :, None], 0.0, emb)  # padding_idx=0
        pe = jnp.asarray(sinusoidal_positional_encoding(self.max_len, self.dim))
        emb = emb + pe[None, : emb.shape[1]]
        return nn.Dropout(self.dropout)(emb, deterministic=deterministic)


class RNNHead(nn.Module):
    """BiLSTM + [Linear → Dropout → Tanh → Linear] TV regressor.

    Contract: reference models/modules.py:190-214 (packed-sequence semantics
    are provided by the length-masked scan in ``ops.lstm``).
    Returns ``(tvs, hidden)`` like the reference's ``(out, hidden_tvs)``.
    """

    hidden_dim: int = 256  # = rnn_in_dim = 2*att_dim (force_aptai.py:34)
    out_dim: int = 9
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool = True):
        h = self.hidden_dim
        fwd = LSTMParams(
            w_ih=self.param("w_ih_fwd", _lstm_init(h), (4 * h, x.shape[-1])),
            w_hh=self.param("w_hh_fwd", _lstm_init(h), (4 * h, h)),
            b_ih=self.param("b_ih_fwd", _lstm_init(h), (4 * h,)),
            b_hh=self.param("b_hh_fwd", _lstm_init(h), (4 * h,)),
        )
        bwd = LSTMParams(
            w_ih=self.param("w_ih_bwd", _lstm_init(h), (4 * h, x.shape[-1])),
            w_hh=self.param("w_hh_bwd", _lstm_init(h), (4 * h, h)),
            b_ih=self.param("b_ih_bwd", _lstm_init(h), (4 * h,)),
            b_hh=self.param("b_hh_bwd", _lstm_init(h), (4 * h,)),
        )
        out, _ = bilstm(x, lengths, fwd, bwd)  # (B, T, 2H)
        hidden = out
        out = nn.Dense(h, name="linear_0")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = jnp.tanh(out)
        out = nn.Dense(self.out_dim, name="linear_1")(out)
        return out, hidden


def _lstm_init(hidden_dim: int):
    """torch nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / np.sqrt(hidden_dim)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvBank(nn.Module):
    """Conv-bank phoneme classifier (API parity; unused by the reference's
    models too — reference models/modules.py:156-187)."""

    output_class_num: int
    kernels: tuple = (3, 5, 7)
    cnn_size: int = 32
    hidden_size: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        h = jnp.tanh(nn.Dense(self.hidden_size, name="in_linear")(features))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        convs = []
        for i, k in enumerate(self.kernels):
            convs.append(
                nn.Conv(self.cnn_size, (k,), padding=k // 2, name=f"cnn_{i}")(h)
            )
        h = jnp.concatenate(convs, axis=-1)
        h = jnp.tanh(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.output_class_num, name="out_linear")(h)
