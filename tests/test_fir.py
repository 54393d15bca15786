"""FIR low-pass: taps + application vs. a float64 NumPy reference implementing
the contract of reference models/modules.py:13-61."""

import numpy as np
import jax.numpy as jnp

from aptai_tpu.ops import lowpass_fir_taps, fir_lowpass


def _reference_taps(cutoff, rate):
    fc = cutoff / rate
    b = 0.08
    N = int(np.ceil(4 / b))
    if not N % 2:
        N += 1
    n = np.arange(N)
    h = np.sinc(fc * 2 * (n - (N - 1) / 2))
    w = 0.5 * (1 - np.cos(n * 2 * np.pi / (N - 1)))
    h = h * w
    return h / np.sum(h)


def _reference_apply(y, taps):
    """Per-channel 'same' correlation in float64 (torch Conv1d semantics)."""
    B, L, C = y.shape
    out = np.zeros_like(y)
    pad = len(taps) // 2
    for b in range(B):
        for c in range(C):
            padded = np.pad(y[b, :, c], pad)
            out[b, :, c] = np.correlate(padded, taps, mode="valid")
    return out


def test_taps_match_reference_contract():
    taps = lowpass_fir_taps(10, 49)
    ref = _reference_taps(10, 49)
    assert taps.shape == (51,)
    np.testing.assert_allclose(taps, ref, rtol=0, atol=1e-15)
    assert abs(taps.sum() - 1.0) < 1e-12


def test_fir_lowpass_matches_float64_reference(rng):
    y = rng.standard_normal((3, 40, 9)).astype(np.float64)
    taps = lowpass_fir_taps(10, 49)
    got = np.asarray(fir_lowpass(jnp.asarray(y, jnp.float32), taps))
    want = _reference_apply(y, taps)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_fir_lowpass_smooths():
    t = np.linspace(0, 1, 98)
    slow = np.sin(2 * np.pi * 3 * t)
    fast = 0.5 * np.sin(2 * np.pi * 22 * t)
    x = (slow + fast)[None, :, None].astype(np.float32)
    taps = lowpass_fir_taps(10, 49)
    y = np.asarray(fir_lowpass(jnp.asarray(x), taps))[0, :, 0]
    # interior (away from edge effects): high-frequency content removed
    err_filtered = np.abs(y[15:-15] - slow[15:-15]).max()
    err_raw = np.abs(x[0, 15:-15, 0] - slow[15:-15]).max()
    assert err_filtered < 0.25 * err_raw
