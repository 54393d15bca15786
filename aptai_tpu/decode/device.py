"""Batched CTC prefix beam search ON DEVICE (jit-compatible).

The reference's beam decode is a host-side C++ search
(``torchaudio.models.decoder.ctc_decoder``, reference models/w2v2_pr.py:144-155,
utility.py:448-471) — on TPU that means a device→host→device round trip per
batch and a *serial* per-utterance search on the host.  This module runs the
same Graves-style prefix search (log-sum-exp merging of hypotheses that share
a collapsed prefix, ``beam_size=10``, ``beam_threshold=50``) as one static-shape
``lax.scan`` over frames, vmapped over the batch, entirely under ``jit``:

* FORCE-APTAI can train/serve with TRUE beam decode in a single XLA program
  (``decode_method='beam_device'``) — no host callback, hence none of the
  callback-thread hazards that forced the split beam_host step
  (see models/force_aptai.py:encode_frozen);
* validation PER decode runs batched on device instead of utterance-serial
  on the host.

Algorithmic note — device-side prefix merging: after extending every beam
prefix with every vocabulary token, hypotheses describing the same collapsed
prefix must merge.  Because beam prefixes are pairwise distinct, the only
possible collision is between the "stay" candidate of prefix *i* and the
"extend" candidate of a parent *j* with ``prefix_i == prefix_j + [last_i]``
(two extends of distinct parents can never coincide; two stays can never
coincide).  That parent/child relation is a (beam × beam) masked comparison
computed per frame — no hashing, no sorting, exact.

Numerics: scores accumulate in float32 (the host twin uses float64); decoded
sequences agree exactly on realistic (peaked) CTC posteriors, and the
agreement is pinned by tests/test_device_beam.py against decode/beam.py.

Capacity semantics: prefixes longer than ``max_output_length`` keep counting
length (so ``truncated`` matches the host contract) but stop storing tokens;
past the cap the repeat/doubling distinction can no longer consult the true
last token, so scores are exact only while sequences fit the cap — matching
the practical regime (the reference *asserts* len < 60,
models/force_aptai.py:111).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# Dead-hypothesis score: far below any real log-prob sum, still finite so
# logaddexp/top_k arithmetic stays NaN-free (same rationale as
# ops/ctc.py::LOG_EPSILON, only scores here are never differentiated).
NEG = -1.0e30


def _beam_step(state, t_row, *, blank, beam_size, beam_threshold, cap,
               input_length):
    """One frame of the prefix search for one utterance."""
    t, row = t_row
    toks, times, lens, p_b, p_nb = state
    k = beam_size
    vocab = row.shape[0]
    pos = jnp.arange(cap)
    vids = jnp.arange(vocab)

    p_tot = jnp.logaddexp(p_b, p_nb)                       # (K,)
    alive = p_tot > NEG / 2
    best = jnp.max(p_tot)
    # Parent prune: reference beam.py:113 `p_tot < best - threshold: continue`
    keep_parent = alive & (p_tot >= best - beam_threshold)

    last = toks[jnp.arange(k), jnp.maximum(lens - 1, 0)]   # (K,) 0 when empty
    has_last = lens > 0
    row_last = row[last]                                    # (K,)

    # ---- stay candidates (prefix unchanged; reference beam.py:117-118,127-129)
    stay_pb = jnp.where(keep_parent, p_tot + row[blank], NEG)
    # repeat-without-blank: same prefix, p_nb + row[last]; candidate prune
    # uses p_tot + row[v] (reference beam.py:124)
    rep_gate = keep_parent & has_last & (p_tot + row_last >= best - beam_threshold)
    rep = jnp.where(rep_gate, p_nb + row_last, NEG)

    # ---- extend candidates ext[j, v]: prefix_j + [v]
    # v == last_j after a blank → doubled token from p_b only
    # (reference beam.py:131-133); otherwise p_tot (beam.py:134-137).
    base = jnp.where(vids[None, :] == last[:, None], p_b[:, None],
                     p_tot[:, None])                        # (K, V)
    ext = base + row[None, :]
    gate = (keep_parent[:, None]
            & (vids[None, :] != blank)
            & (p_tot[:, None] + row[None, :] >= best - beam_threshold))
    ext = jnp.where(gate, ext, NEG)

    # ---- merge: ext of parent j lands on an existing prefix i iff
    # prefix_i == prefix_j + [last_i]
    pmask = pos[None, None, :] < lens[None, :, None]        # (1, K_j, cap)
    prefix_eq = jnp.all((toks[:, None, :] == toks[None, :, :]) | ~pmask,
                        axis=-1)                            # (K_i, K_j)
    match = ((lens[:, None] == lens[None, :] + 1)
             & prefix_eq & alive[:, None] & alive[None, :]
             & has_last[:, None])
    ext_at_last_i = ext[:, last].T                          # [i, j] = ext[j, last_i]
    merge_mass = jax.nn.logsumexp(
        jnp.where(match, ext_at_last_i, NEG), axis=1)       # (K,)
    stay_nb = jnp.logaddexp(rep, merge_mass)
    # Host-exact emission times for merged prefixes: the host dict entry is
    # created by whichever parent is iterated first — beam rank order, which
    # is the slot order here (top_k sorts descending).  The matching j is
    # unique; when it outranks i, the merged hypothesis carries j's times
    # with the new frame appended (reference beam.py:104-109,132-137).
    j_of = jnp.argmax(match, axis=1)                        # (K,) unique j
    use_j = jnp.any(match, axis=1) & (j_of < jnp.arange(k))
    t_from_j = jnp.where(pos[None, :] == lens[j_of][:, None], t, times[j_of])
    stay_times = jnp.where(use_j[:, None], t_from_j, times)
    # the merged extend entry must not survive as a duplicate candidate
    kill = jnp.any(match[:, :, None] & (vids[None, None, :] == last[:, None, None]),
                   axis=0)                                  # (K_j, V)
    ext = jnp.where(kill, NEG, ext)

    # ---- top-k over K stay + K·V extend candidates (reference beam.py:139-143)
    stay_tot = jnp.logaddexp(stay_pb, stay_nb)
    scores = jnp.concatenate([stay_tot, ext.reshape(-1)])
    _, top_idx = lax.top_k(scores, k)
    is_stay = top_idx < k
    pidx = jnp.where(is_stay, top_idx, (top_idx - k) // vocab)
    vtok = jnp.where(is_stay, 0, (top_idx - k) % vocab).astype(jnp.int32)

    new_toks = toks[pidx]
    new_times = jnp.where(is_stay[:, None], stay_times[pidx], times[pidx])
    new_lens = lens[pidx]
    new_pb = jnp.where(is_stay, stay_pb[pidx], NEG)
    new_pnb = jnp.where(is_stay, stay_nb[pidx], ext[pidx, vtok])
    # append the extension token at position len (storage capped; length not)
    wpos = jnp.minimum(new_lens, cap - 1)
    write = (~is_stay) & (new_lens < cap)
    at = write[:, None] & (pos[None, :] == wpos[:, None])
    new_toks = jnp.where(at, vtok[:, None], new_toks)
    new_times = jnp.where(at, t, new_times)
    new_lens = new_lens + (~is_stay).astype(jnp.int32)

    new_state = (new_toks, new_times, new_lens, new_pb, new_pnb)
    active = t < input_length
    merged = tuple(jnp.where(active, n, o) for n, o in zip(new_state, state))
    return merged, None


def _beam_item(log_probs, input_length, *, blank, beam_size, beam_threshold,
               cap):
    t_max, _ = log_probs.shape
    k = beam_size
    toks0 = jnp.zeros((k, cap), jnp.int32)
    times0 = jnp.zeros((k, cap), jnp.int32)
    lens0 = jnp.zeros((k,), jnp.int32)
    p_b0 = jnp.full((k,), NEG, jnp.float32).at[0].set(0.0)
    p_nb0 = jnp.full((k,), NEG, jnp.float32)

    step = functools.partial(
        _beam_step, blank=blank, beam_size=beam_size,
        beam_threshold=beam_threshold, cap=cap, input_length=input_length,
    )
    (toks, times, lens, p_b, p_nb), _ = lax.scan(
        step, (toks0, times0, lens0, p_b0, p_nb0),
        (jnp.arange(t_max), log_probs),
    )
    bi = jnp.argmax(jnp.logaddexp(p_b, p_nb))
    return toks[bi], times[bi], lens[bi], jnp.logaddexp(p_b, p_nb)[bi]


def beam_decode_device(
    log_probs: jnp.ndarray,      # (B, T, V) log-softmax scores
    input_lengths: jnp.ndarray,  # (B,) valid frame counts
    blank: int = 0,
    beam_size: int = 10,
    beam_threshold: float = 50.0,
    max_output_length: int | None = None,
    return_times: bool = False,
):
    """Batched on-device CTC prefix beam search.

    Drop-in for the host :func:`aptai_tpu.decode.beam.beam_decode_padded`
    (same padded-output contract: sequences ``(B, L)`` int32 padded with 0,
    lengths ``(B,)``, truncated-token counts ``(B,)``), but jit-compatible —
    callable from inside a compiled train/predict step.

    Args:
      log_probs: ``(B, T, V)`` log-softmax scores (cast to float32).
      input_lengths: ``(B,)`` valid frame counts; frames past the length are
        ignored exactly (the scan carries state through unchanged).
      max_output_length: static output width ``L`` (defaults to ``T``, under
        which truncation is impossible).
      return_times: also return ``(B, L)`` int32 emission frame indices per
        token (the host decoder's ``timesteps``, including its
        insertion-order semantics for merged hypotheses — tested exact).
    """
    b, t_max, _ = log_probs.shape
    cap = t_max if max_output_length is None else max_output_length
    item = functools.partial(
        _beam_item, blank=blank, beam_size=beam_size,
        beam_threshold=beam_threshold, cap=cap,
    )
    toks, times, lens, _score = jax.vmap(item)(
        log_probs.astype(jnp.float32), input_lengths)
    out_lens = jnp.minimum(lens, cap).astype(jnp.int32)
    truncated = jnp.maximum(lens - cap, 0).astype(jnp.int32)
    if return_times:
        return toks, out_lens, truncated, times
    return toks, out_lens, truncated
