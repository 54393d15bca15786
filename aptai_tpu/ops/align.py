"""Monotonic alignment: host DTW force-align + on-device Viterbi.

* :func:`dtw_force_align` — the working version of ``utility.force_align``
  (reference utility.py:518-536, which wraps librosa ``dtw`` with step sizes
  [[1,1],[1,0]] but mangles the backtrace): align every frame to a phoneme
  of the given sequence, each frame advancing the phoneme index by 0 or 1.
* :func:`viterbi_align` — the same DP as a ``lax.scan`` under ``jit``:
  batched, static-shape, runs on TPU.  This is the on-device alternative to
  decoding alignments on the host (SURVEY.md §5.8: "eliminate the FORCE
  decode round-trip with an on-device Viterbi/greedy alignment").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30


def dtw_force_align(cost: np.ndarray, phn_ids) -> list:
    """Align frames to a phoneme sequence by max-accumulated score.

    Args:
      cost: ``(T, V)`` frame-phoneme scores (higher = better, e.g. log-probs).
      phn_ids: sequence of phoneme ids (length N ≤ T).

    Returns:
      list of N-relative indices, one per frame (monotonic, starts at 0,
      ends at N−1).
    """
    scores = np.asarray(cost, np.float64)[:, list(phn_ids)]  # (T, N)
    t_len, n = scores.shape
    if n > t_len:
        raise ValueError("more phonemes than frames; alignment infeasible")
    acc = np.full((t_len, n), -np.inf)
    acc[0, 0] = scores[0, 0]
    for t in range(1, t_len):
        stay = acc[t - 1]
        adv = np.concatenate([[-np.inf], acc[t - 1, :-1]])
        acc[t] = scores[t] + np.maximum(stay, adv)
    # backtrace from (T-1, N-1)
    path = np.empty(t_len, np.int64)
    j = n - 1
    path[-1] = j
    for t in range(t_len - 1, 0, -1):
        if j > 0 and acc[t - 1, j - 1] >= acc[t - 1, j]:
            j -= 1
        path[t - 1] = j
    return path.tolist()


def viterbi_align(
    scores: jnp.ndarray,        # (B, T, N) frame-phoneme scores
    text_lengths: jnp.ndarray,  # (B,)
    frame_lengths: jnp.ndarray,  # (B,)
):
    """Batched monotonic Viterbi alignment under ``jit``.

    Each valid frame is assigned a phoneme position 0..text_len−1; the path
    is monotonic (advance 0/1 per frame), starts at position 0 and ends at
    ``text_len − 1`` at frame ``frame_len − 1``.  Padded frames repeat the
    final position.  Returns ``(B, T)`` int32 positions.
    """
    b, t_len, n = scores.shape
    text_lengths = text_lengths.astype(jnp.int32)
    frame_lengths = frame_lengths.astype(jnp.int32)
    pos = jnp.arange(n)

    col_valid = pos[None, :] < text_lengths[:, None]          # (B, N)
    s = jnp.where(col_valid[:, None, :], scores.astype(jnp.float32), NEG)

    init = jnp.where(pos[None, :] == 0, s[:, 0, :], NEG)      # (B, N)

    def step(acc, s_t):
        stay = acc
        adv = jnp.concatenate([jnp.full((b, 1), NEG), acc[:, :-1]], axis=1)
        take_adv = adv > stay
        new_acc = s_t + jnp.maximum(stay, adv)
        return new_acc, take_adv

    acc, back = lax.scan(step, init, s.transpose(1, 0, 2)[1:])
    back = jnp.concatenate(
        [jnp.zeros((1, b, n), bool), back], axis=0
    )  # (T, B, N), back[t] says: best way into (t, j) advanced from j-1

    end_pos = jnp.maximum(text_lengths - 1, 0)                # (B,)

    def backstep(j, xs):
        back_t, is_after_end = xs
        took = jnp.take_along_axis(back_t, j[:, None], axis=1)[:, 0]
        j_prev = jnp.where(took, j - 1, j)
        # frames at/after frame_len keep the end position
        j_prev = jnp.where(is_after_end, j, j_prev)
        return j_prev, j

    # walk backwards from t = T-1; frames >= frame_len are "after end"
    ts = jnp.arange(t_len - 1, -1, -1)
    after_end = ts[:, None] >= frame_lengths[None, :]          # (T, B)
    _, path_rev = lax.scan(
        backstep, end_pos, (back[ts], after_end)
    )
    return path_rev[::-1].T.astype(jnp.int32)                  # (B, T)
