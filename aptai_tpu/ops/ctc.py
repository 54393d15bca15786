"""Connectionist Temporal Classification: loss + on-device greedy decode.

The loss is a log-semiring forward (alpha) recursion expressed as a
``lax.scan`` over time and vmapped over the batch — the TPU-native
replacement for cuDNN's ``F.ctc_loss``.  Semantics match
``torch.nn.functional.ctc_loss(blank=0, reduction='mean',
zero_infinity=True)`` as used by the reference (models/w2v2_pr.py:73-81):

* ``reduction='mean'``: each item's negative log-likelihood is divided by its
  *target* length, then averaged over the batch;
* ``zero_infinity=True``: infeasible alignments (e.g. target longer than the
  input allows) contribute 0 loss and 0 gradient;
* blank id is 0 (reference train/train_phoneme_recognizer.py:344).

Everything is static-shape: targets are padded to ``S_max`` and lengths are
carried explicitly, so one compiled program serves every bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Large-negative stand-in for log(0).  Using a finite value keeps gradients
# NaN-free (−inf − −inf in logaddexp backward would poison the pullback).
LOG_EPSILON = -1e5

# lax.scan unroll for the alpha recursion.  Measured (benchmarks/
# head_profile.py sweep on the chip): unrolling HURTS here — fwd+bwd
# 2.46 / 2.73 / 2.86 ms at unroll 1 / 4 / 16 (each step depends on the
# whole previous alpha row, so there is nothing to pipeline and the
# unrolled body just bloats).  The actual win was hoisting the per-step
# emission gather out of the loop: 18.8 → 2.5 ms fwd+bwd.
ALPHA_SCAN_UNROLL = 1


def _extended_targets(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """Interleave blanks: (S,) -> (2S+1,) = [b, t0, b, t1, ..., b]."""
    s = targets.shape[0]
    ext = jnp.full((2 * s + 1,), blank, dtype=targets.dtype)
    return ext.at[1::2].set(targets)


def _ctc_alpha_scan(
    log_probs: jnp.ndarray,   # (T, V) log-softmax scores
    input_length: jnp.ndarray,  # ()
    targets: jnp.ndarray,     # (S,) padded
    target_length: jnp.ndarray,  # ()
    blank: int,
) -> jnp.ndarray:
    """Forward score log p(targets | log_probs) for one sequence (negated later)."""
    ext = _extended_targets(targets, blank)          # (L,) with L = 2S+1
    length = ext.shape[0]
    pos = jnp.arange(length)

    # A diagonal skip (l-2 -> l) is allowed when ext[l] is a real label that
    # differs from ext[l-2] (standard CTC topology).
    prev2 = jnp.where(pos >= 2, ext[jnp.maximum(pos - 2, 0)], blank)
    allow_skip = (pos >= 2) & (ext != blank) & (ext != prev2)

    # Positions beyond the true extended length are invalid.
    valid = pos < (2 * target_length + 1)

    # Hoist the emission gather out of the recursion: one (T, L) gather
    # here instead of a per-step (L,) gather inside the loop body (the scan
    # is latency-bound; anything movable out of the trip should move).
    emit = log_probs[:, ext]  # (T, L)

    alpha0 = jnp.where(pos == 0, emit[0], LOG_EPSILON)
    alpha0 = jnp.where((pos == 1) & valid, emit[0], alpha0)

    def step(alpha, te):
        t, e = te
        from_self = alpha
        from_prev = jnp.concatenate(
            [jnp.full((1,), LOG_EPSILON, alpha.dtype), alpha[:-1]]
        )
        from_skip = jnp.concatenate(
            [jnp.full((2,), LOG_EPSILON, alpha.dtype), alpha[:-2]]
        )
        from_skip = jnp.where(allow_skip, from_skip, LOG_EPSILON)
        merged = jnp.logaddexp(jnp.logaddexp(from_self, from_prev), from_skip)
        new_alpha = jnp.where(valid, merged + e, LOG_EPSILON)
        # Freeze the recursion past the true input length.
        new_alpha = jnp.where(t < input_length, new_alpha, alpha)
        return new_alpha, None

    t_steps = jnp.arange(1, log_probs.shape[0])
    alpha, _ = lax.scan(step, alpha0, (t_steps, emit[1:]),
                        unroll=ALPHA_SCAN_UNROLL)

    last = 2 * target_length       # final blank position
    second = jnp.maximum(last - 1, 0)  # final label position
    score_last = alpha[last]
    score_second = jnp.where(target_length > 0, alpha[second], LOG_EPSILON)
    return jnp.logaddexp(score_last, score_second)


def ctc_forward_score(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-item log-likelihood log p(y|x), shape ``(B,)``.

    Args:
      log_probs: ``(B, T, V)`` log-softmax outputs.
      input_lengths: ``(B,)`` valid frame counts.
      targets: ``(B, S)`` label ids (padding value is irrelevant).
      target_lengths: ``(B,)`` valid label counts.
    """
    return jax.vmap(
        functools.partial(_ctc_alpha_scan, blank=blank)
    )(log_probs, input_lengths, targets, target_lengths)


def ctc_loss(
    log_probs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """CTC loss with ``torch.nn.functional.ctc_loss`` semantics.

    Matches the reference call sites:
    * PR training: reduction='mean', zero_infinity=True, blank=0
      (reference models/w2v2_pr.py:73-81);
    * ForwardSum inner CTC: ``nn.CTCLoss(zero_infinity=True)`` defaults
      (reference models/modules.py:75).
    """
    log_like = ctc_forward_score(
        log_probs, input_lengths, targets, target_lengths, blank=blank
    )
    loss = -log_like
    if zero_infinity:
        # Infeasible alignments surface as ~LOG_EPSILON-scale scores.
        loss = jnp.where(loss >= -0.5 * LOG_EPSILON, 0.0, loss)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        denom = jnp.maximum(target_lengths, 1).astype(loss.dtype)
        return jnp.mean(loss / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


def greedy_decode(
    logits: jnp.ndarray,
    input_lengths: jnp.ndarray,
    blank: int = 0,
    max_output_length: int | None = None,
    return_truncated: bool = False,
):
    """Batched on-device greedy CTC decode (argmax → collapse → de-blank).

    This is the jit-safe replacement for the reference's host-side beam
    decoder round-trip inside every FORCE-APTAI training step
    (reference models/w2v2_pr.py:144-155 called from models/force_aptai.py:97):
    instead of shipping logits to the CPU, the collapse/compaction runs on
    device with a fixed output size.

    Args:
      logits: ``(B, T, V)`` (pre- or post-softmax — only argmax is used).
      input_lengths: ``(B,)`` valid frame counts.
      blank: blank id.
      max_output_length: static output width; defaults to ``T``.

      return_truncated: also return the per-item count of tokens dropped by
        the ``max_output_length`` cap (the reference *asserts* ``len < 60``,
        models/force_aptai.py:111 — here overflow is observable, not fatal).

    Returns:
      ``(tokens, lengths)`` where tokens is ``(B, max_output_length)`` int32
      padded with ``blank`` (= 0, matching the reference's phoneme-sequence
      padding, models/force_aptai.py:112) and lengths is ``(B,)``; plus
      ``truncated`` ``(B,)`` int32 when ``return_truncated``.
    """
    b, t, _ = logits.shape
    out_w = t if max_output_length is None else max_output_length

    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)          # (B, T)
    frame_valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    ids = jnp.where(frame_valid, ids, blank)
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    keep = (ids != blank) & (ids != prev) & frame_valid            # (B, T)

    # Stable compaction: destination index = prefix count of kept tokens.
    dest = jnp.cumsum(keep, axis=1) - 1                            # (B, T)
    dest = jnp.where(keep & (dest < out_w), dest, out_w)           # drop overflow
    out = jnp.full((b, out_w + 1), blank, jnp.int32)
    out = jax.vmap(lambda o, d, v: o.at[d].set(v, mode="drop"))(out, dest, ids)
    n_kept = jnp.sum(keep, axis=1)
    lengths = jnp.minimum(n_kept, out_w).astype(jnp.int32)
    if return_truncated:
        truncated = jnp.maximum(n_kept - out_w, 0).astype(jnp.int32)
        return out[:, :out_w], lengths, truncated
    return out[:, :out_w], lengths
