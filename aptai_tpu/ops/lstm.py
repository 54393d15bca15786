"""Length-masked (bi)LSTM as a ``lax.scan`` — the TPU replacement for cuDNN
``nn.LSTM`` + packed sequences.

The reference's FORCE-APTAI head runs a 1-layer batch-first BiLSTM over the
cross-attention output, using ``pack_padded_sequence`` for B>1 so that the
backward direction starts at each sequence's true last frame
(reference models/modules.py:190-214).  Packing is a GPU-kernel concept; the
TPU-idiomatic equivalent is dense batching with explicit length masks:

* forward direction: the carry is frozen once ``t >= length`` so the final
  hidden state equals the state at the true end (packed semantics);
* backward direction: inputs are reversed *within each valid length*
  (gather at index ``len-1-t``), scanned, and un-reversed, so outputs at
  padded positions are zero and valid positions match packed outputs.

Gate math matches torch ``nn.LSTM`` exactly: gate order (i, f, g, o), two
bias vectors, sigmoid/tanh nonlinearities — verified against torch in
tests/test_lstm.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


# lax.scan unroll factor for the LSTM cell.  Measured flat within tunnel
# noise at the FORCE head shapes (benchmarks/head_profile.py sweep:
# fwd+bwd 2.94 / 2.87 / 2.96 / 2.58 ms at unroll 1 / 4 / 8 / 16) — the
# recurrence serializes on the carry, so unrolling mostly saves loop
# bookkeeping; 8 kept as a mild compile-size/throughput balance.
SCAN_UNROLL = 8


class LSTMParams(NamedTuple):
    """Weights in torch layout: w_ih (4H, I), w_hh (4H, H), b_ih (4H,), b_hh (4H,)."""

    w_ih: jnp.ndarray
    w_hh: jnp.ndarray
    b_ih: jnp.ndarray
    b_hh: jnp.ndarray


def _cell_step(params: LSTMParams, x_t, h, c):
    gates = x_t @ params.w_ih.T + h @ params.w_hh.T + params.b_ih + params.b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    params: LSTMParams,
    reverse: bool = False,
):
    """Run a single-direction LSTM over a padded batch.

    Args:
      x: ``(B, T, I)`` inputs.
      lengths: ``(B,)`` valid lengths.
      params: torch-layout weights.
      reverse: scan right-to-left within each sequence's valid region.

    Returns:
      ``(outputs, (h_n, c_n))`` with outputs ``(B, T, H)`` zeroed at padding
      and final states taken at each sequence's true end.
    """
    b, t, _ = x.shape
    hdim = params.w_hh.shape[1]
    lengths = lengths.astype(jnp.int32)

    if reverse:
        # Gather x[len-1-t] (clipped) so padded tails fold to index 0 but are
        # masked out below anyway.
        idx = lengths[:, None] - 1 - jnp.arange(t)[None, :]
        x = jnp.take_along_axis(x, jnp.maximum(idx, 0)[:, :, None], axis=1)

    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)  # (B, T)

    def step(carry, xs):
        h, c = carry
        x_t, m_t = xs
        h_new, c_new = _cell_step(params, x_t, h, c)
        m = m_t[:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        out = h_new * m
        return (h, c), out

    h0 = jnp.zeros((b, hdim), x.dtype)
    c0 = jnp.zeros((b, hdim), x.dtype)
    (h_n, c_n), outs = lax.scan(
        step, (h0, c0), (x.transpose(1, 0, 2), mask.T), unroll=SCAN_UNROLL
    )
    outs = outs.transpose(1, 0, 2)  # (B, T, H)

    if reverse:
        idx = lengths[:, None] - 1 - jnp.arange(t)[None, :]
        outs = jnp.take_along_axis(outs, jnp.maximum(idx, 0)[:, :, None], axis=1)
        outs = outs * mask[:, :, None]

    return outs, (h_n, c_n)


def bilstm(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd: LSTMParams,
    bwd: LSTMParams,
):
    """Bidirectional LSTM; concatenates [forward ‖ backward] features.

    Equivalent to torch ``nn.LSTM(bidirectional=True, batch_first=True)`` fed
    packed sequences (reference models/modules.py:197, 205-208).

    Both directions run in ONE ``lax.scan`` over a direction-stacked batch
    (the backward direction sees inputs time-reversed within each valid
    length): the scan is latency-bound, so halving the sequential step
    count beats two back-to-back scans; per-direction math is unchanged."""
    b, t, _ = x.shape
    hdim = fwd.w_hh.shape[1]
    lengths = lengths.astype(jnp.int32)

    rev_idx = jnp.maximum(
        lengths[:, None] - 1 - jnp.arange(t)[None, :], 0
    )[:, :, None]
    x_rev = jnp.take_along_axis(x, rev_idx, axis=1)
    xs = jnp.stack([x, x_rev])                       # (2, B, T, I)
    w_ih = jnp.stack([fwd.w_ih, bwd.w_ih])           # (2, 4H, I)
    w_hh = jnp.stack([fwd.w_hh, bwd.w_hh])           # (2, 4H, H)
    bias = jnp.stack(
        [fwd.b_ih + fwd.b_hh, bwd.b_ih + bwd.b_hh]
    )[:, None, :]                                    # (2, 1, 4H)
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(x.dtype)

    def step(carry, inp):
        h, c = carry                                 # (2, B, H) each
        x_t, m_t = inp                               # (2, B, I), (B,)
        gates = (jnp.einsum("dbi,dgi->dbg", x_t, w_ih)
                 + jnp.einsum("dbh,dgh->dbg", h, w_hh) + bias)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m_t[None, :, None]
        h = m * h_new + (1 - m) * h                  # freeze past length
        c = m * c_new + (1 - m) * c
        return (h, c), h_new * m

    h0 = jnp.zeros((2, b, hdim), x.dtype)
    c0 = jnp.zeros((2, b, hdim), x.dtype)
    (h_n, c_n), outs = lax.scan(
        step, (h0, c0), (xs.transpose(2, 0, 1, 3), mask.T),
        unroll=SCAN_UNROLL,
    )
    out_f = outs[:, 0].transpose(1, 0, 2)            # (B, T, H)
    out_b = jnp.take_along_axis(
        outs[:, 1].transpose(1, 0, 2), rev_idx, axis=1
    ) * mask[:, :, None]
    state_f = (h_n[0], c_n[0])
    state_b = (h_n[1], c_n[1])
    return jnp.concatenate([out_f, out_b], axis=-1), (state_f, state_b)
