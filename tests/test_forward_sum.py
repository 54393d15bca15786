"""ForwardSum loss vs a torch replica of reference models/modules.py:65-117."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from aptai_tpu.ops import forward_sum_loss


def _torch_off_diag_prior(N, T, g=0.2):
    """Port of reference ForwardSumLoss.off_diagonal_prior (modules.py:119-126)."""
    n = torch.arange(N)
    t = torch.arange(T)
    t = t.unsqueeze(1).repeat(1, N)
    n = n.unsqueeze(0).repeat(T, 1)
    W = torch.exp(-((n / N - t / T) ** 2) / (2 * g**2))
    return torch.log_softmax(W.unsqueeze(1), dim=-1)


def _torch_forward_sum(attn_logprob, text_lens, mel_lens, blank_logprob=-1.0,
                       off_diag_prior=False, prior_g=0.2):
    """Line-for-line port of the reference ForwardSumLoss (torch, CPU golden),
    including the disabled-by-default off-diagonal prior (modules.py:108)."""
    attn = torch.tensor(attn_logprob)[:, None]  # (B, 1, T, N)
    attn_pd = F.pad(attn, (1, 0, 0, 0, 0, 0, 0, 0), value=blank_logprob)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    cost_total = 0.0
    for bid in range(attn.shape[0]):
        target_seq = torch.arange(1, text_lens[bid] + 1)[None]
        curr = attn_pd[bid].permute(1, 0, 2)
        curr = curr[: mel_lens[bid], :, : text_lens[bid] + 1]
        if off_diag_prior:
            curr = curr + _torch_off_diag_prior(
                int(text_lens[bid]) + 1, int(mel_lens[bid]), g=prior_g)
        curr = torch.log_softmax(curr[None], dim=3)[0]
        cost = ctc(
            curr,
            target_seq,
            input_lengths=torch.tensor(mel_lens[bid : bid + 1]),
            target_lengths=torch.tensor(text_lens[bid : bid + 1]),
        )
        cost_total = cost_total + cost
    return float(cost_total / attn.shape[0])


def test_forward_sum_matches_reference_port(rng):
    B, T, N = 3, 25, 8
    attn = rng.standard_normal((B, T, N)).astype(np.float32)
    text_lens = np.array([8, 4, 6], np.int64)
    mel_lens = np.array([25, 18, 12], np.int64)
    got = float(forward_sum_loss(jnp.asarray(attn), jnp.asarray(text_lens),
                                 jnp.asarray(mel_lens)))
    want = _torch_forward_sum(attn, text_lens, mel_lens)
    assert abs(got - want) < 1e-4, (got, want)


def test_forward_sum_with_presoftmaxed_input(rng):
    # The model feeds log_softmax(energy + mask) (force_aptai.py:130); the loss
    # re-normalizes, so arbitrary additive scores must give identical results
    # up to the shared shift.
    B, T, N = 2, 15, 5
    energy = rng.standard_normal((B, T, N)).astype(np.float32)
    text_lens = np.array([5, 3], np.int64)
    mel_lens = np.array([15, 10], np.int64)
    got = float(forward_sum_loss(jnp.asarray(energy), jnp.asarray(text_lens),
                                 jnp.asarray(mel_lens)))
    want = _torch_forward_sum(energy, text_lens, mel_lens)
    assert abs(got - want) < 1e-4


def test_forward_sum_off_diag_prior_matches_reference_port(rng):
    # The reference ships the Gaussian band prior disabled
    # (modules.py:108,119-126); our opt-in must reproduce its exact math.
    B, T, N = 3, 25, 8
    attn = rng.standard_normal((B, T, N)).astype(np.float32)
    text_lens = np.array([8, 4, 6], np.int64)
    mel_lens = np.array([25, 18, 12], np.int64)
    for g in (0.2, 0.08):
        got = float(forward_sum_loss(
            jnp.asarray(attn), jnp.asarray(text_lens), jnp.asarray(mel_lens),
            off_diag_prior=True, prior_g=g))
        want = _torch_forward_sum(attn, text_lens, mel_lens,
                                  off_diag_prior=True, prior_g=g)
        assert abs(got - want) < 1e-4, (g, got, want)
    # and the prior actually changes the loss (it is not a no-op)
    base = float(forward_sum_loss(
        jnp.asarray(attn), jnp.asarray(text_lens), jnp.asarray(mel_lens)))
    with_prior = float(forward_sum_loss(
        jnp.asarray(attn), jnp.asarray(text_lens), jnp.asarray(mel_lens),
        off_diag_prior=True))
    assert abs(base - with_prior) > 1e-3


def test_forward_sum_prior_prefers_diagonal_band():
    # On UNIFORM scores the prior concentrates probability exactly where
    # the monotonic CTC paths live (the n/N ≈ t/T band), so the forward-sum
    # loss must drop, and drop further as the band narrows — the mechanism
    # by which the prior counters silence/diagonal collapse.
    T, N = 30, 6
    unif = np.zeros((1, T, N), np.float32)
    tl = np.array([N], np.int64)
    ml = np.array([T], np.int64)

    def loss(prior, g=0.2):
        return float(forward_sum_loss(jnp.asarray(unif), jnp.asarray(tl),
                                      jnp.asarray(ml), off_diag_prior=prior,
                                      prior_g=g))

    assert loss(True) < loss(False) - 1.0
    assert loss(True, g=0.08) < loss(True, g=0.2)


def test_forward_sum_prefers_monotonic_alignment():
    # A sharp monotonic diagonal should score much better than uniform noise.
    T, N = 24, 6
    diag = np.full((1, T, N), -8.0, np.float32)
    for t in range(T):
        diag[0, t, min(t * N // T, N - 1)] = 8.0
    uniform = np.zeros((1, T, N), np.float32)
    tl = np.array([N], np.int64)
    ml = np.array([T], np.int64)
    l_diag = float(forward_sum_loss(jnp.asarray(diag), jnp.asarray(tl), jnp.asarray(ml)))
    l_unif = float(forward_sum_loss(jnp.asarray(uniform), jnp.asarray(tl), jnp.asarray(ml)))
    assert l_diag < l_unif
