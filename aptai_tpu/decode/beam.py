"""Lexicon-free CTC prefix beam search (pure-Python reference).

Replaces the flashlight-text decoder behind
``torchaudio.models.decoder.ctc_decoder(lexicon=None, nbest=1, beam_size=10,
beam_threshold=50, blank_token='(blank)', sil_token='(...)')``
(reference models/w2v2_pr.py:144-155, utility.py:448-471), with the same
configuration surface and output contract (collapsed token sequence +
per-token emission frames).  Scoring is Graves-style prefix search with
log-sum-exp merging of hypotheses sharing a collapsed prefix.

The C++ twin (native/aptai_native.cpp, via decode/native.py) implements the
identical algorithm; tests assert agreement.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

NEG_INF = -math.inf


def beam_decode_padded(log_probs, frame_lengths, max_len: int,
                       out_rows: int | None = None):
    """Host beam decode of a batch into fixed-width padded id sequences.

    Used by the *split* beam_host training step (device encode → THIS on the
    main thread → device head; see models/force_aptai.py:encode_frozen) and
    numerically identical to the in-jit callback decode.  Returns
    ``(seqs (rows, max_len) int32, lengths (rows,) int32, truncated (rows,)
    int32)`` with the reference's 60-token cap semantics
    (force_aptai.py:109-115; overflow counted, not fatal).

    ``out_rows`` > B pads the outputs with zero-length sequences — callers
    whose device batch is bucketed wider than the real item count (serving)
    pass only the real rows here (the serial host search is the split path's
    bottleneck; decoding full-length silence pad rows would nearly double
    it) and keep the head's static batch shape via the padding."""
    from aptai_tpu.decode.native import beam_search_native

    lp = np.asarray(log_probs, np.float32)
    fl = np.asarray(frame_lengths)
    b = lp.shape[0]
    rows = b if out_rows is None else out_rows
    assert rows >= b, (rows, b)
    out = np.zeros((rows, max_len), np.int32)
    lens = np.zeros((rows,), np.int32)
    trunc = np.zeros((rows,), np.int32)
    for i in range(b):
        nat = beam_search_native(lp[i, : fl[i]])
        toks = (nat[0] if nat is not None
                else list(beam_search(lp[i, : fl[i]])[0].tokens))
        n = min(len(toks), max_len)
        out[i, :n] = toks[:n]
        lens[i] = n
        trunc[i] = max(len(toks) - max_len, 0)
    return out, lens, trunc


def _logadd(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log1p(math.exp(min(a, b) - m))


@dataclass
class BeamHypothesis:
    tokens: Tuple[int, ...]
    timesteps: Tuple[int, ...]
    score: float


@dataclass
class _Pref:
    times: Tuple[int, ...] = ()
    p_b: float = NEG_INF
    p_nb: float = NEG_INF


def beam_search(
    log_probs: np.ndarray,
    blank: int = 0,
    beam_size: int = 10,
    beam_threshold: float = 50.0,
    nbest: int = 1,
) -> List[BeamHypothesis]:
    """Decode one utterance.  ``log_probs``: (T, V) log-softmax scores."""
    log_probs = np.asarray(log_probs, np.float64)
    t_len, vocab = log_probs.shape

    beam: Dict[Tuple[int, ...], _Pref] = {(): _Pref((), 0.0, NEG_INF)}

    for t in range(t_len):
        row = log_probs[t]
        best_total = max(_logadd(p.p_b, p.p_nb) for p in beam.values())
        nxt: Dict[Tuple[int, ...], _Pref] = {}

        def get(toks: Tuple[int, ...], times: Tuple[int, ...]) -> _Pref:
            pref = nxt.get(toks)
            if pref is None:
                pref = _Pref(times)
                nxt[toks] = pref
            return pref

        for toks, pr in beam.items():
            p_tot = _logadd(pr.p_b, pr.p_nb)
            if p_tot < best_total - beam_threshold:
                continue

            # blank extension keeps the prefix
            dst = get(toks, pr.times)
            dst.p_b = _logadd(dst.p_b, p_tot + row[blank])

            for v in range(vocab):
                if v == blank:
                    continue
                pv = row[v]
                if p_tot + pv < best_total - beam_threshold:
                    continue
                if toks and toks[-1] == v:
                    # repeat without blank: same prefix
                    dst = get(toks, pr.times)
                    dst.p_nb = _logadd(dst.p_nb, pr.p_nb + pv)
                    # after a blank: doubled token
                    ext = toks + (v,)
                    dst2 = get(ext, pr.times + (t,))
                    dst2.p_nb = _logadd(dst2.p_nb, pr.p_b + pv)
                else:
                    ext = toks + (v,)
                    dst = get(ext, pr.times + (t,))
                    dst.p_nb = _logadd(dst.p_nb, p_tot + pv)

        ranked = sorted(
            nxt.items(), key=lambda kv: _logadd(kv[1].p_b, kv[1].p_nb),
            reverse=True,
        )[:beam_size]
        beam = dict(ranked)

    out = [
        BeamHypothesis(toks, pr.times, _logadd(pr.p_b, pr.p_nb))
        for toks, pr in sorted(
            beam.items(), key=lambda kv: _logadd(kv[1].p_b, kv[1].p_nb),
            reverse=True,
        )
    ]
    return out[:nbest]
