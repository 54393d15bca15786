"""Windowed-sinc FIR low-pass filtering for tract-variable smoothing.

Numerical contract (reference models/modules.py:13-61, ``LowPassFilterLayer``):
cutoff ``fc = cutoff / sampling_rate`` (must be ≤ 0.5), transition band 0.08
of the sampling rate, window length ``N = ceil(4 / 0.08) = 50 → 51``
(forced odd), taps ``h[n] = sinc(2 fc (n − (N−1)/2)) · hann(n)`` normalized to
sum 1, applied independently to each of the 9 TV channels with 'same' padding
and no bias.

TPU-native design: instead of the reference's per-channel Python loop over a
single-channel ``Conv1d`` (modules.py:56-60), the filter is one depthwise
(grouped) convolution over all channels, which XLA fuses into a single
VPU/MXU pass.  Taps are designed in float64 on the host (the reference also
computes the filter in double, modules.py:52); the on-device convolution runs
in float32, which keeps the result within ~1e-6 of the float64 reference —
see tests/test_fir.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax


def lowpass_fir_taps(
    cutoff: float,
    sampling_rate: float,
    transition_band: float = 0.08,
) -> np.ndarray:
    """Design windowed-sinc low-pass taps (float64 NumPy, host-side).

    Mirrors ``LowPassFilterLayer._get_filter_weights``
    (reference models/modules.py:27-44).
    """
    fc = cutoff / sampling_rate
    if fc > 0.5:
        raise ValueError(
            "Cutoff frequency must be at most half the sampling rate "
            f"(got fc={fc})."
        )
    n_taps = int(np.ceil(4 / transition_band))
    if n_taps % 2 == 0:
        n_taps += 1  # force odd length so 'same' padding is symmetric
    n = np.arange(n_taps)
    h = np.sinc(2 * fc * (n - (n_taps - 1) / 2))
    w = 0.5 * (1 - np.cos(2 * np.pi * n / (n_taps - 1)))  # Hann window
    h = h * w
    return h / np.sum(h)


@functools.partial(jnp.vectorize, signature="(t,c),(n)->(t,c)")
def _fir_same_conv(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' convolution of (T, C) with shared taps (N,)."""
    c = x.shape[-1]
    lhs = x.T[None]  # (1, C, T)
    rhs = jnp.broadcast_to(taps[None, None, :], (c, 1, taps.shape[0]))
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0].T


def fir_lowpass(x: jnp.ndarray, taps) -> jnp.ndarray:
    """Apply a shared FIR low-pass to every channel of ``x``.

    Args:
      x: ``(..., T, C)`` trajectories (typically ``(B, T, 9)`` TVs).
      taps: ``(N,)`` filter taps from :func:`lowpass_fir_taps`.

    Returns:
      Smoothed array of the same shape and dtype float32.

    The symmetric taps make correlation == convolution, so XLA's
    cross-correlating ``conv_general_dilated`` matches the reference's
    ``nn.Conv1d`` exactly.
    """
    taps = jnp.asarray(taps, dtype=jnp.float32)
    x32 = x.astype(jnp.float32)
    return _fir_same_conv(x32, taps)
