"""Audio/DSP primitives: STFT, mel, MFCC, resampling, IIR filtering, interp.

These replace the reference's C/Fortran dependency stack (librosa mel/STFT,
scipy butter/filtfilt/interp1d, torchaudio resample — see SURVEY.md §2.4)
with JAX ops that run on-device, plus thin host-side design helpers (filter
coefficients, mel matrices) computed once in NumPy/SciPy.

Contracts reproduced:
* :func:`stft_magnitude` — ``utility.pySTFT`` (reference utility.py:70-81):
  reflect padding of ``n_fft//2``, periodic Hann, hop 256, |rfft|.
* :func:`melspectrogram` — ``utility.compute_mspec`` (utility.py:84-95):
  librosa Slaney mel (fmin 90, fmax 7600, 80 bands), dB floor 1e-5,
  ``(20·log10(·) − 16 + 100)/100`` scaling.
* :func:`resample` — ``torchaudio.functional.resample`` (used at
  data/dataset_commonphone.py:31-33, data/dataset_hprc.py:70-72):
  polyphase windowed-sinc, ``lowpass_filter_width=6``, ``rolloff=0.99``,
  Hann window, expressed as one strided convolution.
* :func:`jax_filtfilt` — ``scipy.signal.filtfilt`` (utility.py:504-510):
  zero-phase forward-backward IIR with odd-reflection padding, the filter
  recursion as a ``lax.scan``.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# STFT / mel / MFCC
# ---------------------------------------------------------------------------

def _hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann (scipy ``get_window('hann', n, fftbins=True)``)."""
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_magnitude(
    x: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256
) -> jnp.ndarray:
    """Magnitude STFT matching ``utility.pySTFT`` (reference utility.py:70-81).

    Args:
      x: ``(L,)`` waveform.
    Returns:
      ``(n_frames, n_fft//2 + 1)`` magnitudes, where
      ``n_frames = (L + 2*(n_fft//2) - (n_fft - hop)) // hop``.
    """
    pad = n_fft // 2
    xp = jnp.pad(x, pad, mode="reflect")
    noverlap = n_fft - hop_length
    n_frames = (xp.shape[0] - noverlap) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    frames = jax.vmap(
        lambda s: lax.dynamic_slice(xp, (s,), (n_fft,))
    )(starts)
    window = jnp.asarray(_hann_periodic(n_fft), dtype=x.dtype)
    spec = jnp.fft.rfft(frames * window, n=n_fft)
    return jnp.abs(spec)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    safe_f = np.maximum(f, min_log_hz)  # avoid log(0) in the unused branch
    return np.where(f >= min_log_hz,
                    min_log_hz / f_sp + np.log(safe_f / min_log_hz) / logstep,
                    mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_filterbank(
    sr: int = 16_000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
) -> np.ndarray:
    """librosa-compatible Slaney-normalized mel filterbank, ``(n_mels, n_fft//2+1)``.

    Reimplements ``librosa.filters.mel`` (htk=False, norm='slaney') used by
    ``utility.compute_mspec`` (reference utility.py:88) without the librosa
    dependency.  Host-side float64 NumPy; the result is a compile-time
    constant folded into the on-device matmul.
    """
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return weights * enorm[:, None]


def melspectrogram(
    x: jnp.ndarray,
    sr: int = 16_000,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 90.0,
    fmax: float = 7600.0,
) -> jnp.ndarray:
    """``utility.compute_mspec`` contract (reference utility.py:84-95).

    Returns ``(n_frames, n_mels)`` normalized log-mel in ~[0, 1].
    """
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T,
                        dtype=jnp.float32)
    stft = stft_magnitude(x.astype(jnp.float32), n_fft, hop_length)
    min_level = jnp.exp(-100 / 20 * jnp.log(10.0))  # 1e-5
    stft_mel = stft @ basis
    stft_db = 20 * jnp.log10(jnp.maximum(min_level, stft_mel)) - 16
    return (stft_db + 100) / 100


def _dct_ii_ortho_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (scipy ``dct(type=2, norm='ortho')``)."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    mat[0] *= 1 / np.sqrt(2)
    return mat


def mfcc(
    x: jnp.ndarray,
    sr: int = 16_000,
    n_mfcc: int = 13,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """MFCCs: power-mel → dB → orthonormal DCT-II (librosa conventions).

    Used by the HPRC offline prep (reference data/dataset_hprc.py:1800-1847).
    Returns ``(n_frames, n_mfcc)``.
    """
    fmax = sr / 2 if fmax is None else fmax
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T,
                        dtype=jnp.float32)
    power = stft_magnitude(x.astype(jnp.float32), n_fft, hop_length) ** 2
    melspec = power @ basis
    # librosa.power_to_db with default ref=1.0, amin=1e-10, top_db=80
    log_spec = 10.0 * jnp.log10(jnp.maximum(1e-10, melspec))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 80.0)
    dct = jnp.asarray(_dct_ii_ortho_matrix(n_mfcc, n_mels), dtype=jnp.float32)
    return log_spec @ dct.T


# ---------------------------------------------------------------------------
# Resampling (torchaudio sinc_interp_hann contract)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Polyphase windowed-sinc kernel, shape ``(new_freq, width*2 + orig_freq)``.

    Mirrors torchaudio's ``_get_sinc_resample_kernel`` (Hann window variant).
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float32), width


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample ``(..., L)`` audio; matches torchaudio ``resample`` defaults.

    On device this is a single strided conv (polyphase filter bank → MXU).
    """
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    kernel, width = _resample_kernel(orig, new, lowpass_filter_width, rolloff)

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    length = x.shape[-1]
    lead = x.shape[:-1]
    xf = x.reshape((-1, 1, length)).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig)))
    out = lax.conv_general_dilated(
        xf,
        jnp.asarray(kernel)[:, None, :],  # (new, 1, K) OIW
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, frames)
    out = out.transpose(0, 2, 1).reshape(len(xf), -1)
    target_length = math.ceil(new * length / orig) if isinstance(length, int) else None
    out = out[:, :target_length]
    out = out.reshape(lead + (-1,))
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# IIR filtering (scipy filtfilt contract) as lax.scan
# ---------------------------------------------------------------------------

def _lfilter_scan(b: jnp.ndarray, a: jnp.ndarray, x: jnp.ndarray, zi: jnp.ndarray):
    """Direct-form-II-transposed IIR filter along the last axis of 1-D ``x``."""
    n = b.shape[0]

    def step(z, x_t):
        y_t = b[0] * x_t + z[0]
        z_new = b[1:] * x_t - a[1:] * y_t + jnp.concatenate(
            [z[1:], jnp.zeros((1,), z.dtype)]
        )
        return z_new, y_t

    z0 = zi
    _, y = lax.scan(step, z0, x)
    del n
    return y


def jax_filtfilt(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase filtering; matches ``scipy.signal.filtfilt`` defaults
    (padtype='odd', padlen=3*max(len(a),len(b)), Gustafsson off).

    ``b``/``a`` are host-side design constants (e.g. from ``scipy.signal.butter``);
    the forward and backward recursions run as scans on device.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    ntaps = max(len(a), len(b))
    padlen = 3 * ntaps
    if x.shape[-1] <= padlen:
        raise ValueError("input too short for filtfilt padding")

    # steady-state initial conditions (scipy lfilter_zi), host-side
    from scipy.signal import lfilter_zi

    zi = lfilter_zi(b, a)

    bj = jnp.asarray(b, dtype=x.dtype)
    aj = jnp.asarray(a, dtype=x.dtype)
    zij = jnp.asarray(zi, dtype=x.dtype)

    # odd extension
    ext = jnp.concatenate([
        2 * x[0] - x[1 : padlen + 1][::-1],
        x,
        2 * x[-1] - x[-padlen - 1 : -1][::-1],
    ])
    y = _lfilter_scan(bj, aj, ext, zij * ext[0])
    y = _lfilter_scan(bj, aj, y[::-1], zij * y[-1])[::-1]
    return y[padlen:-padlen]


def butter_lowpass_filtfilt(
    x: jnp.ndarray, cutoff: float, fs: float, order: int = 5
) -> jnp.ndarray:
    """``utility.butter_lowpass_filter`` contract (reference utility.py:504-510).

    Butterworth design on host (scipy), zero-phase application on device.
    """
    from scipy.signal import butter

    nyq = 0.5 * fs
    b, a = butter(order, cutoff / nyq, btype="low", analog=False)
    return jax_filtfilt(b, a, x)


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------

def interp1d_linear(x_new: jnp.ndarray, x_old: jnp.ndarray, y_old: jnp.ndarray):
    """Linear interpolation (scipy ``interp1d(kind='linear')`` interior behavior).

    Used to resample TV trajectories to the encoder frame rate
    (reference data/dataset_hprc.py:2307-2313, 2316-2423).
    """
    return jnp.interp(x_new, x_old, y_old)


def interpolate_nan(sig: np.ndarray) -> np.ndarray:
    """NaN repair matching ``utility.interpolate_nan`` (utility.py:513-514),
    i.e. pandas ``Series.interpolate()``: linear between valid samples,
    trailing NaNs forward-filled with the last valid value, leading NaNs kept.

    Host-side (offline EMA prep only).
    """
    sig = np.asarray(sig, dtype=np.float64)
    out = sig.copy()
    valid = ~np.isnan(sig)
    if not valid.any():
        return out
    idx = np.arange(len(sig))
    first, last = idx[valid][0], idx[valid][-1]
    interior = (idx >= first) & (idx <= last)
    out[interior] = np.interp(idx[interior], idx[valid], sig[valid])
    out[last:] = np.where(np.isnan(out[last:]), out[last], out[last:])
    return out
