"""CTC loss vs torch.nn.functional.ctc_loss (CPU torch as golden), and
greedy decode vs a NumPy reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from aptai_tpu.ops import ctc_loss, ctc_forward_score, greedy_decode


def _random_case(rng, B=4, T=37, V=12, S=9):
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    target_lengths = rng.integers(1, S + 1, size=B).astype(np.int32)
    targets = rng.integers(1, V, size=(B, S)).astype(np.int32)
    return np.asarray(log_probs), input_lengths, targets, target_lengths


def _torch_ctc(log_probs, input_lengths, targets, target_lengths,
               reduction="mean", blank=0):
    lp = torch.tensor(log_probs).transpose(0, 1)  # (T, B, V)
    return F.ctc_loss(
        lp,
        torch.tensor(targets),
        torch.tensor(input_lengths),
        torch.tensor(target_lengths),
        blank=blank,
        reduction=reduction,
        zero_infinity=True,
    ).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_torch_mean(seed):
    rng = np.random.default_rng(seed)
    lp, il, tg, tl = _random_case(rng)
    got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tg),
                         jnp.asarray(tl)))
    want = float(_torch_ctc(lp, il, tg, tl))
    assert abs(got - want) < 1e-4, (got, want)


def test_ctc_loss_per_item_matches_torch():
    rng = np.random.default_rng(3)
    lp, il, tg, tl = _random_case(rng, B=6, T=50, V=8, S=12)
    got = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(tg), jnp.asarray(tl),
                              reduction="none"))
    want = _torch_ctc(lp, il, tg, tl, reduction="none")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_loss_with_repeats_and_blanks_in_target_neighborhood():
    # Repeated labels exercise the skip-transition rule.
    rng = np.random.default_rng(4)
    B, T, V, S = 3, 30, 5, 8
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    targets = np.tile(np.array([1, 1, 2, 2, 3, 1, 1, 4], np.int32), (B, 1))
    il = np.full(B, T, np.int32)
    tl = np.array([8, 5, 2], np.int32)
    got = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(tg := targets), jnp.asarray(tl),
                              reduction="none"))
    want = _torch_ctc(lp, il, tg, tl, reduction="none")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_infeasible_zeroed():
    # target longer than input frames -> infeasible -> zero (zero_infinity)
    rng = np.random.default_rng(5)
    B, T, V, S = 2, 6, 5, 10
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    targets = rng.integers(1, V, size=(B, S)).astype(np.int32)
    il = np.array([6, 6], np.int32)
    tl = np.array([10, 3], np.int32)  # first infeasible (needs >=10 frames)
    got = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il),
                              jnp.asarray(targets), jnp.asarray(tl),
                              reduction="none"))
    want = _torch_ctc(lp, il, targets, tl, reduction="none")
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert got[0] == 0.0


def test_ctc_gradients_match_torch():
    rng = np.random.default_rng(6)
    lp, il, tg, tl = _random_case(rng, B=2, T=20, V=6, S=5)
    logits = rng.standard_normal(lp.shape).astype(np.float32)

    def jax_loss(x):
        lps = jax.nn.log_softmax(x, -1)
        return ctc_loss(lps, jnp.asarray(il), jnp.asarray(tg), jnp.asarray(tl))

    g_jax = np.asarray(jax.grad(jax_loss)(jnp.asarray(logits)))

    xt = torch.tensor(logits, requires_grad=True)
    loss_t = F.ctc_loss(
        torch.log_softmax(xt, -1).transpose(0, 1),
        torch.tensor(tg), torch.tensor(il), torch.tensor(tl),
        blank=0, reduction="mean", zero_infinity=True,
    )
    loss_t.backward()
    np.testing.assert_allclose(g_jax, xt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_forward_score_jits():
    rng = np.random.default_rng(7)
    lp, il, tg, tl = _random_case(rng)
    f = jax.jit(ctc_forward_score)
    out = f(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tg), jnp.asarray(tl))
    assert out.shape == (lp.shape[0],)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# greedy decode
# ---------------------------------------------------------------------------

def _numpy_greedy(logits, lengths, blank=0):
    outs = []
    for b in range(logits.shape[0]):
        ids = logits[b, : lengths[b]].argmax(-1)
        seq, prev = [], -1
        for i in ids:
            if i != blank and i != prev:
                seq.append(int(i))
            prev = int(i)
        outs.append(seq)
    return outs


def test_greedy_decode_matches_numpy(rng):
    B, T, V = 5, 40, 7
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lengths = rng.integers(5, T + 1, size=B).astype(np.int32)
    toks, lens = jax.jit(greedy_decode)(jnp.asarray(logits), jnp.asarray(lengths))
    toks, lens = np.asarray(toks), np.asarray(lens)
    want = _numpy_greedy(logits, lengths)
    for b in range(B):
        assert lens[b] == len(want[b])
        np.testing.assert_array_equal(toks[b, : lens[b]], want[b])
        assert np.all(toks[b, lens[b]:] == 0)


def test_greedy_decode_max_output_truncates(rng):
    B, T, V = 2, 30, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lengths = np.full(B, T, np.int32)
    toks, lens = greedy_decode(jnp.asarray(logits), jnp.asarray(lengths),
                               max_output_length=3)
    want = _numpy_greedy(logits, lengths)
    for b in range(B):
        assert lens[b] == min(3, len(want[b]))
        np.testing.assert_array_equal(np.asarray(toks)[b, : lens[b]],
                                      want[b][: int(lens[b])])
