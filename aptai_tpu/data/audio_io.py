"""Host-side wav IO + resampling to the 16 kHz model rate.

Replaces ``torchaudio.load`` + ``torchaudio.functional.resample``
(reference data/dataset_commonphone.py:30-33, data/dataset_hprc.py:69-72)
with scipy wav IO and a NumPy polyphase resampler that reuses the *same*
windowed-sinc kernel as the on-device :func:`aptai_tpu.ops.signal.resample`
— host prep and device front-end agree bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile

from aptai_tpu import SAMPLE_RATE
from aptai_tpu.ops.signal import _resample_kernel


def resample_np(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """NumPy twin of ``ops.signal.resample`` (torchaudio sinc_interp_hann)."""
    if orig_freq == new_freq:
        return x.astype(np.float32)
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    kernel, width = _resample_kernel(orig, new)  # (new, K)
    length = x.shape[-1]
    xp = np.pad(x.astype(np.float32), (width, width + orig))
    n_frames = (len(xp) - kernel.shape[1]) // orig + 1
    idx = np.arange(kernel.shape[1])[None, :] + orig * np.arange(n_frames)[:, None]
    frames = xp[idx]                      # (frames, K)
    out = frames @ kernel.T               # (frames, new)
    out = out.reshape(-1)
    return out[: math.ceil(new * length / orig)]


def load_wav(path):
    """Read a wav file → (float32 mono waveform in [-1, 1], sample_rate)."""
    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, int(sr)


def save_wav(path, data: np.ndarray, sr: int) -> None:
    wavfile.write(path, sr, np.asarray(data, dtype=np.float32))


def load_wav_16k(path) -> np.ndarray:
    """Load + resample to 16 kHz (the reference's universal front door)."""
    data, sr = load_wav(path)
    return resample_np(data, sr, SAMPLE_RATE)
