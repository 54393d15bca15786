"""ForwardSum (one-TTS-alignment) loss, fully vectorized for TPU.

Numerical contract (reference models/modules.py:65-117, ``ForwardSumLoss``):

1. pad a blank *column* at text index 0 with log-prob ``blank_logprob = -1``;
2. per batch item, slice scores to ``[mel_len, text_len + 1]`` and
   re-``log_softmax`` over the text dimension;
3. run CTC with the monotonic target sequence ``1..text_len`` (every token
   unique, so the alignment is forced to advance monotonically);
4. average the per-item ``nn.CTCLoss`` values (torch default reduction
   'mean' divides each item by its target length) over the batch.

The reference loops over the batch in Python because of variable lengths
(modules.py:97-114) — a serial host loop.  Here the slice is replaced by
masking to ``LOG_EPSILON`` before the softmax (identical normalization,
because exp(-1e5) underflows to exactly 0 in float32) and the per-item CTC
runs under ``vmap``: one fused device program, no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aptai_tpu.ops.ctc import LOG_EPSILON, ctc_forward_score


def off_diag_prior_logprobs(
    t_mel: int,
    n_text: int,
    text_lengths: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    g: float = 0.2,
) -> jnp.ndarray:
    """Off-diagonal Gaussian alignment prior, batched over padded shapes.

    Numerical contract (reference models/modules.py:108,119-126,
    ``ForwardSumLoss.off_diagonal_prior`` — shipped disabled there, the
    reference-sanctioned lever against ForwardSum silence/diagonal
    collapse): per item with ``N = text_len + 1`` columns (blank included)
    and ``T = mel_len`` rows,

        ``W[t, n] = exp(-(n/N - t/T)^2 / (2 g^2))``,

    returned as ``log_softmax(W)`` over the text dimension.  The reference
    computes it on the per-item sliced ``[T_i, N_i]`` matrix; here the
    normalization runs on the padded ``(B, T_mel, N_text+1)`` grid with
    invalid columns masked to ``LOG_EPSILON`` — identical values on the
    valid region (softmax over exactly the valid columns), one fused
    device program instead of a per-item host loop.

    Returns ``(B, T_mel, N_text + 1)`` log-prior to ADD to the attention
    scores before the loss's own re-normalization.
    """
    text_lengths = text_lengths.astype(jnp.float32)
    mel_lengths = mel_lengths.astype(jnp.float32)
    n_cols = jnp.arange(n_text + 1, dtype=jnp.float32)  # includes blank col
    t_rows = jnp.arange(t_mel, dtype=jnp.float32)
    # per-item normalized coordinates: n/N with N = text_len+1, t/T
    n_norm = n_cols[None, None, :] / (text_lengths + 1.0)[:, None, None]
    t_norm = t_rows[None, :, None] / jnp.maximum(mel_lengths, 1.0)[:, None, None]
    w = jnp.exp(-((n_norm - t_norm) ** 2) / (2.0 * g * g))
    col_valid = (jnp.arange(n_text + 1)[None, None, :]
                 <= text_lengths[:, None, None])
    w = jnp.where(col_valid, w, LOG_EPSILON)
    return jax.nn.log_softmax(w, axis=-1)


def forward_sum_loss(
    attn_logprob: jnp.ndarray,
    text_lengths: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    blank_logprob: float = -1.0,
    off_diag_prior: bool = False,
    prior_g: float = 0.2,
) -> jnp.ndarray:
    """Forward-sum alignment loss.

    Args:
      attn_logprob: ``(B, T_mel, N_text)`` attention scores (the reference
        passes ``log_softmax(energy + pad_mask)``, models/force_aptai.py:130,
        but any additive scores work — they are re-normalized below).
      text_lengths: ``(B,)`` phoneme-sequence lengths.
      mel_lengths: ``(B,)`` frame-sequence lengths.
      blank_logprob: score of the inserted blank column (reference
        models/modules.py:70: −1).
      off_diag_prior: add the reference's (disabled-by-default) Gaussian
        band prior to the scores before normalization — the
        one-TTS-alignment remedy for diagonal/silence collapse
        (reference models/modules.py:108,119-126).
      prior_g: Gaussian width of the prior (reference default g=0.2).

    Returns:
      Scalar loss (batch mean).
    """
    b, t_mel, n_text = attn_logprob.shape
    text_lengths = text_lengths.astype(jnp.int32)
    mel_lengths = mel_lengths.astype(jnp.int32)

    # 1. blank column at text index 0.
    scores = jnp.pad(
        attn_logprob.astype(jnp.float32),
        ((0, 0), (0, 0), (1, 0)),
        constant_values=blank_logprob,
    )  # (B, T, N+1)

    if off_diag_prior:
        scores = scores + off_diag_prior_logprobs(
            t_mel, n_text, text_lengths, mel_lengths, g=prior_g
        )

    # 2. restrict normalization to the first text_len+1 columns, exactly as the
    # reference's slice-then-log_softmax (modules.py:106-109).
    col = jnp.arange(n_text + 1)[None, None, :]
    col_valid = col <= text_lengths[:, None, None]
    scores = jnp.where(col_valid, scores, LOG_EPSILON)
    log_probs = jax.nn.log_softmax(scores, axis=-1)

    # 3. monotonic targets 1..text_len (padded tail is masked by target_lengths).
    targets = jnp.broadcast_to(jnp.arange(1, n_text + 1)[None, :], (b, n_text))

    log_like = ctc_forward_score(
        log_probs, mel_lengths, targets, text_lengths, blank=0
    )
    nll = -log_like
    # zero_infinity=True (reference modules.py:75): zero out infeasible items
    # *before* the length normalization so the threshold stays unambiguous.
    nll = jnp.where(nll >= -0.5 * LOG_EPSILON, 0.0, nll)
    per_item = nll / jnp.maximum(text_lengths, 1)  # torch 'mean' semantics
    return jnp.mean(per_item)
