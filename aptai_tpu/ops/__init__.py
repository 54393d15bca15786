"""Numerical primitives for the TPU-native APTAI framework.

Everything here is pure-functional JAX, jit-safe (static shapes, no
data-dependent Python control flow) and unit-tested against NumPy/SciPy/torch
goldens in ``tests/``.
"""

from aptai_tpu.ops.fir import lowpass_fir_taps, fir_lowpass
from aptai_tpu.ops.ctc import (
    ctc_loss,
    ctc_forward_score,
    greedy_decode,
)
from aptai_tpu.ops.forward_sum import forward_sum_loss
from aptai_tpu.ops.lstm import lstm, bilstm
from aptai_tpu.ops.signal import (
    stft_magnitude,
    mel_filterbank,
    melspectrogram,
    mfcc,
    resample,
    jax_filtfilt,
    butter_lowpass_filtfilt,
    interp1d_linear,
    interpolate_nan,
)
from aptai_tpu.ops.attention import multi_head_attention, flash_attention
from aptai_tpu.ops.align import dtw_force_align, viterbi_align

__all__ = [
    "lowpass_fir_taps",
    "fir_lowpass",
    "ctc_loss",
    "ctc_forward_score",
    "greedy_decode",
    "forward_sum_loss",
    "lstm",
    "bilstm",
    "stft_magnitude",
    "mel_filterbank",
    "melspectrogram",
    "mfcc",
    "resample",
    "jax_filtfilt",
    "butter_lowpass_filtfilt",
    "interp1d_linear",
    "interpolate_nan",
    "multi_head_attention",
    "flash_attention",
    "dtw_force_align",
    "viterbi_align",
]
