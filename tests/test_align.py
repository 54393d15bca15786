"""DTW force-align (host) and Viterbi alignment (jit, batched)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.ops.align import dtw_force_align, viterbi_align


def _brute_force_best_path(scores):
    """Enumerate all monotonic paths (tiny T, N) and return the best."""
    t_len, n = scores.shape
    best, best_path = -np.inf, None

    def rec(t, j, total, path):
        nonlocal best, best_path
        total = total + scores[t, j]
        path = path + [j]
        if t == t_len - 1:
            if j == n - 1 and total > best:
                best, best_path = total, path
            return
        for nj in (j, j + 1):
            if nj < n:
                rec(t + 1, nj, total, path)

    rec(0, 0, 0.0, [])
    return best_path


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dtw_force_align_optimal(seed):
    rng = np.random.default_rng(seed)
    t_len, n = 9, 4
    cost = rng.standard_normal((t_len, 6))
    phn_ids = [1, 3, 0, 5][:n]
    got = dtw_force_align(cost, phn_ids)
    want = _brute_force_best_path(cost[:, phn_ids])
    assert got == want


def test_dtw_force_align_monotonic_and_complete(rng):
    cost = rng.standard_normal((30, 8))
    ids = [2, 5, 1, 7, 0]
    path = dtw_force_align(cost, ids)
    assert path[0] == 0 and path[-1] == len(ids) - 1
    diffs = np.diff(path)
    assert ((diffs == 0) | (diffs == 1)).all()


def test_viterbi_align_matches_dtw(rng):
    B, T, N = 3, 20, 6
    scores = rng.standard_normal((B, T, N)).astype(np.float32)
    text_lens = np.array([6, 4, 3], np.int32)
    frame_lens = np.array([20, 15, 9], np.int32)
    got = np.asarray(jax.jit(viterbi_align)(
        jnp.asarray(scores), jnp.asarray(text_lens), jnp.asarray(frame_lens)
    ))
    for b in range(B):
        want = dtw_force_align(scores[b, : frame_lens[b]],
                               list(range(text_lens[b])))
        np.testing.assert_array_equal(got[b, : frame_lens[b]], want)
        # padded frames hold the final position
        assert (got[b, frame_lens[b]:] == text_lens[b] - 1).all()
