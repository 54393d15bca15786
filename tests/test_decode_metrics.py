"""Beam search (Python vs C++), edit distance, and the metric registry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.decode import (
    beam_search,
    beam_search_native,
    edit_distance,
    greedy_decode,
    native_available,
)
from aptai_tpu.train.metrics import (
    PERAccumulator,
    aggregate_mean_std,
    boundaries_from_frames,
    boundary_stats,
    compute_per,
    evaluate_overlap,
    flatten_dict,
    frame_error_rate,
    frame_ids_to_sequence,
    phn_frames_to_durations,
    tvs_pcc,
    tvs_rmse,
)


def _python_levenshtein(a, b):
    dp = np.zeros((len(a) + 1, len(b) + 1), np.int64)
    dp[:, 0] = np.arange(len(a) + 1)
    dp[0, :] = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return dp[-1, -1]


def test_edit_distance_cases(rng):
    assert edit_distance([], []) == 0
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], []) == 3
    for _ in range(20):
        a = rng.integers(0, 5, size=rng.integers(0, 15)).tolist()
        b = rng.integers(0, 5, size=rng.integers(0, 15)).tolist()
        assert edit_distance(a, b) == _python_levenshtein(a, b)


def test_native_library_builds():
    assert native_available(), "C++ native helpers failed to build"


def test_beam_search_simple_path():
    # strongly peaked logits: beam must equal greedy/argmax collapse
    T, V = 12, 5
    ids = [1, 1, 0, 2, 2, 3, 0, 0, 3, 3, 4, 0]
    lp = np.full((T, V), -10.0, np.float32)
    for t, i in enumerate(ids):
        lp[t, i] = 0.0
    hyp = beam_search(lp)[0]
    assert list(hyp.tokens) == [1, 2, 3, 3, 4]
    # timesteps: first frame of each committed token
    assert list(hyp.timesteps) == [0, 3, 5, 8, 10]


def test_beam_search_outperforms_greedy_on_ambiguity():
    # classic case where summing over alignments beats argmax:
    # p(a a) vs blank-heavy frames
    lp = np.log(np.asarray([
        [0.4, 0.35, 0.25],
        [0.4, 0.35, 0.25],
    ], np.float32))  # cols: blank, a, b
    hyp = beam_search(lp, beam_size=10)[0]
    # greedy picks blank,blank -> empty; beam sums: P(a)= .35*.4*2 + .35*.35
    assert list(hyp.tokens) == [1]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_beam_matches_python(seed):
    rng = np.random.default_rng(seed)
    T, V = 30, 8
    logits = rng.standard_normal((T, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    py = beam_search(lp)[0]
    nat = beam_search_native(lp)
    assert nat is not None
    toks, times = nat
    assert toks == list(py.tokens)
    assert times == list(py.timesteps)


def test_beam_agrees_with_greedy_when_confident(rng):
    # truly peaked per-frame distributions (one-hot ± 15 nats): the argmax
    # path dominates the alignment sum, so beam == greedy collapse
    T, V = 25, 6
    ids = rng.integers(0, V, size=T)
    logits = np.full((T, V), -15.0, np.float32)
    logits[np.arange(T), ids] = 0.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    toks_g, lens_g = greedy_decode(jnp.asarray(lp)[None],
                                   jnp.asarray([T], np.int32))
    greedy = np.asarray(toks_g)[0][: int(lens_g[0])].tolist()
    hyp = beam_search(lp)[0]
    assert list(hyp.tokens) == greedy


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_per_contract():
    assert compute_per([1, 2, 3, 4], [1, 2, 3, 4]) == 0.0
    assert compute_per([1, 2, 3, 4], [1, 2, 4]) == 25.0
    acc = PERAccumulator()
    acc.update([1, 2, 3, 4], [1, 2, 4])
    acc.update([1, 2], [1, 2])
    assert acc.per == pytest.approx(1 / 6)


def test_fer_and_overlap():
    gt = [[1, 1, 2, 2], [3, 3]]
    pred = [[1, 2, 2, 2], [3, 1]]
    assert frame_error_rate(gt, pred) == pytest.approx(2 / 6)
    assert evaluate_overlap(gt, pred) == pytest.approx(4 / 6)


def test_boundary_stats_perfect_and_offset():
    y = np.array([0.1, 0.5, 0.9])
    p, r, f1, rval = boundary_stats(y, y)
    assert p > 0.99 and r > 0.99 and f1 > 0.99 and rval > 0.99
    yhat = y + 0.05  # outside 0.02 tolerance
    p2, r2, f2, rv2 = boundary_stats(y, yhat)
    assert p2 < 0.01 and r2 < 0.01


def test_tv_metric_dicts(rng):
    gt = rng.standard_normal((50, 9))
    rmse = tvs_rmse(gt, gt)
    assert all(v == 0 for v in rmse.values())
    pcc = tvs_pcc(gt, gt + 0.01 * rng.standard_normal((50, 9)))
    assert all(v > 0.99 for v in pcc.values())
    assert set(rmse) == {"LA", "LP", "JA", "TTCL", "TTCD", "TMCL", "TMCD",
                         "TBCL", "TBCD"}


def test_frames_to_durations_contract():
    # reference utility.py:539-558 semantics
    out = phn_frames_to_durations([1, 1, 1, 2, 2, 7])
    assert out == [(0.0, 0.06, 1), (0.06, 0.1, 2), (0.1, 0.12, 7)]
    assert frame_ids_to_sequence([1, 1, 2, 2, 2, 1]) == [1, 2, 1]
    b = boundaries_from_frames([1, 1, 1, 2, 2, 7])
    np.testing.assert_allclose(b, [0.06, 0.1])


def test_flatten_and_aggregate():
    flat = flatten_dict({"a": {"b": 1, "c": {"d": 2}}, "e": 3})
    assert flat == {"a_b": 1, "a_c_d": 2, "e": 3}
    mean, std = aggregate_mean_std([{"m": 1.0}, {"m": 3.0}])
    assert mean["m"] == 2.0 and std["m"] == 1.0
