"""Signal ops vs NumPy/SciPy goldens."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.signal import butter, filtfilt, get_window
from scipy.fft import dct as scipy_dct

from aptai_tpu.ops import (
    stft_magnitude,
    mel_filterbank,
    melspectrogram,
    resample,
    jax_filtfilt,
    butter_lowpass_filtfilt,
    interp1d_linear,
    interpolate_nan,
)
from aptai_tpu.ops.signal import _dct_ii_ortho_matrix


def _py_stft(x, fft_length=1024, hop_length=256):
    """utility.pySTFT reference port (reference utility.py:70-81)."""
    x = np.pad(x, int(fft_length // 2), mode="reflect")
    noverlap = fft_length - hop_length
    shape = x.shape[:-1] + ((x.shape[-1] - noverlap) // hop_length, fft_length)
    strides = x.strides[:-1] + (hop_length * x.strides[-1], x.strides[-1])
    result = np.lib.stride_tricks.as_strided(x, shape=shape, strides=strides)
    fft_window = get_window("hann", fft_length, fftbins=True)
    result = np.fft.rfft(fft_window * result, n=fft_length).T
    return np.abs(result)


def test_stft_matches_pystft(rng):
    x = rng.standard_normal(5000).astype(np.float32)
    got = np.asarray(stft_magnitude(jnp.asarray(x)))
    want = _py_stft(x).T  # compute_mspec transposes to (frames, bins)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank()
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; triangles overlap neighbours
    assert (fb.sum(axis=1) > 0).all()
    # Slaney norm: filters integrate to ~2/bandwidth -> peak < 0.1 for wide bins
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()


def test_melspectrogram_shapes_and_range(rng):
    x = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    m = np.asarray(melspectrogram(jnp.asarray(x)))
    assert m.shape[1] == 80
    assert np.isfinite(m).all()
    # compute_mspec normalizes dB into roughly [0, 1]
    assert m.min() >= -0.2 and m.max() <= 1.2


def test_dct_matrix_matches_scipy():
    mat = _dct_ii_ortho_matrix(13, 80)
    x = np.random.default_rng(0).standard_normal(80)
    want = scipy_dct(x, type=2, norm="ortho")[:13]
    np.testing.assert_allclose(mat @ x, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("orig,new", [(44100, 16000), (22050, 16000), (8000, 16000)])
def test_resample_sine_fidelity(orig, new):
    t = np.arange(int(orig * 0.5)) / orig
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), orig, new))
    assert y.shape[0] == int(np.ceil(new * len(x) / orig))
    t2 = np.arange(len(y)) / new
    want = np.sin(2 * np.pi * 440 * t2)
    # ignore filter edges
    m = slice(100, -100)
    err = np.sqrt(np.mean((y[m] - want[m]) ** 2))
    assert err < 0.01, err


def test_resample_identity():
    x = jnp.ones(100)
    assert resample(x, 16000, 16000) is x


def test_resample_batched(rng):
    x = rng.standard_normal((3, 4410)).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 44100, 16000))
    y0 = np.asarray(resample(jnp.asarray(x[0]), 44100, 16000))
    assert y.shape == (3, 1600)
    np.testing.assert_allclose(y[0], y0, rtol=1e-5, atol=1e-6)


def test_filtfilt_matches_scipy(rng):
    x = rng.standard_normal(500).astype(np.float64)
    b, a = butter(5, 10 / (0.5 * 100), btype="low")
    want = filtfilt(b, a, x)
    got = np.asarray(jax_filtfilt(b, a, jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_butter_lowpass_filtfilt_contract(rng):
    # reference utility.py:504-510 with its EMA usage (10 Hz cutoff @ 100 Hz)
    x = rng.standard_normal(400).astype(np.float64)
    b, a = butter(5, 10 / 50.0, btype="low")
    want = filtfilt(b, a, x)
    got = np.asarray(butter_lowpass_filtfilt(jnp.asarray(x, jnp.float32), 10, 100, 5))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_interp1d_linear():
    x_old = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    y_old = jnp.asarray([0.0, 10.0, 20.0, 10.0])
    x_new = jnp.asarray([0.5, 1.5, 2.5])
    np.testing.assert_allclose(
        np.asarray(interp1d_linear(x_new, x_old, y_old)), [5.0, 15.0, 15.0]
    )


def test_interpolate_nan_matches_pandas():
    import pandas as pd

    sig = np.array([np.nan, 1.0, np.nan, np.nan, 4.0, np.nan])
    want = pd.Series(sig).interpolate().to_numpy()
    got = interpolate_nan(sig)
    np.testing.assert_allclose(got, want, equal_nan=True)
