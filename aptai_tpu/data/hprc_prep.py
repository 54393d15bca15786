"""HPRC offline corpus preparation (host-side CPU tool).

Rebuild of the ~2,300-line offline pipeline in reference
data/dataset_hprc.py:141-2649, restructured into testable functions in the
reference's processing order (dataset_hprc.py __main__:2580-2622):

1.  :func:`extract_mat`            — .mat → wav + EMA pickles + palate + text
2.  :func:`lowpass_ema`            — NaN interpolation + Butterworth(10 Hz,
                                     order 5, filtfilt) per trajectory
3.  :func:`maus_g2p`               — MAUS BAS forced alignment (network)
4.  :func:`compute_tvs`            — 9 tract variables from EMA geometry
5.  normalization variants         — :func:`zscore_utterance` (the blessed
                                     one, dataset_hprc.py:2610), plus
                                     min-max / z-score per speaker & global
6.  :func:`interpolate_tvs_to_frames` — linear resample to the encoder
                                     frame count
7.  :func:`phoneme_frame_labels`   — MAUS timestamps → 20 ms frame ids
8.  :func:`build_hprc_csv`         — manifest

Notable TPU-era simplification: the reference loads a full wav2vec2
checkpoint just to discover the encoder's output length T for resampling
(dataset_hprc.py:2328-2341, 2365); here T comes from the closed-form conv
length formula (``Wav2Vec2Config.feat_extract_output_lengths``) — no model
in the data pipeline.
"""

from __future__ import annotations

import csv
import os
import pickle
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
from scipy.signal import butter, filtfilt

from aptai_tpu import SAMPLE_RATE, TV_ORDER
from aptai_tpu.data.audio_io import load_wav, resample_np, save_wav
from aptai_tpu.data.textgrid import parse_textgrid, textgrid_phonemes
from aptai_tpu.models.configs import Wav2Vec2Config
from aptai_tpu.ops.signal import interpolate_nan

EMA_SENSORS = ("TR", "TB", "TT", "UL", "LL", "ML", "JAW", "JAWL")


# ---------------------------------------------------------------------------
# 1. .mat extraction
# ---------------------------------------------------------------------------

def _cell_field(cell, idx: int):
    """Field ``idx`` of an HPRC .mat cell (NAME, SRATE, SIGNAL, ...),
    robust to the object-array nestings different scipy/MATLAB versions
    produce ((3,), (1,3), (3,1), np.void)."""
    if isinstance(cell, np.void):
        v = cell[idx]
    else:
        c = np.asarray(cell)
        if c.dtype == object or c.dtype.fields:
            c = c.reshape(-1)
            v = c[idx] if c.dtype == object else c[0][idx]
        else:
            v = c[idx]
    while isinstance(v, np.ndarray) and v.dtype == object and v.size == 1:
        v = v.reshape(-1)[0]
    return v


def extract_mat(data_path, target_path=None, resample_fs: int = SAMPLE_RATE):
    """Extract audio (resampled), EMA trajectories, palate traces, and word
    transcripts from the raw HPRC .mat release
    (reference data/dataset_hprc.py:229-435)."""
    import scipy.io

    data_path = Path(data_path)
    target_path = Path(target_path or (str(data_path) + "_prep"))
    for spk_dir in sorted(p for p in data_path.iterdir() if p.is_dir()):
        spk = spk_dir.name
        for sub in spk_dir.iterdir():
            if "data" in sub.name.lower():
                for mat_file in sorted(sub.glob("*.mat")):
                    mat = scipy.io.loadmat(mat_file)
                    key = mat_file.stem
                    if "palate" in key:
                        arr = mat[key]
                        palate = {
                            "x": [r[0] for r in arr],
                            "y": [r[1] for r in arr],
                            "z": [r[2] for r in arr],
                        }
                        out = target_path / spk / "ema"
                        out.mkdir(parents=True, exist_ok=True)
                        with open(out / (key + ".pkl"), "wb") as f:
                            pickle.dump(palate, f)
                        continue
                    data = mat[key]
                    fs = int(np.squeeze(_cell_field(data[0, 0], 1)))
                    audio = np.squeeze(
                        np.asarray(_cell_field(data[0, 0], 2), np.float64)
                    ).astype(np.float32)
                    audio = resample_np(audio, fs, resample_fs)
                    audio_dir = target_path / spk / "audio"
                    audio_dir.mkdir(parents=True, exist_ok=True)
                    save_wav(audio_dir / (key + ".wav"), audio, resample_fs)

                    ema: Dict[str, Dict[str, List[float]]] = {}
                    for i, sensor in enumerate(EMA_SENSORS, start=1):
                        if spk == "F02" and sensor == "ML":
                            continue  # F02 has no ML channel (ref :351-354)
                        col = i - 1 if (spk == "F02" and sensor in
                                        ("JAW", "JAWL")) else i
                        traj = np.asarray(_cell_field(data[0, col], 2),
                                          np.float64)
                        ema[sensor] = {
                            "x": [r[0] for r in traj],
                            "y": [r[1] for r in traj],
                            "z": [r[2] for r in traj],
                        }
                    ema_dir = target_path / spk / "ema"
                    ema_dir.mkdir(parents=True, exist_ok=True)
                    with open(ema_dir / (key + ".pkl"), "wb") as f:
                        pickle.dump(ema, f)
            elif "TextGrids" in sub.name:
                for tg in sorted(sub.glob("*.TextGrid")):
                    tiers = parse_textgrid(tg)
                    words = [iv.text for iv in tiers.get("word", [])
                             if iv.text and iv.text != "sp"]
                    txt_dir = target_path / spk / "text"
                    txt_dir.mkdir(parents=True, exist_ok=True)
                    (txt_dir / (tg.stem + ".txt")).write_text(
                        " ".join(words).lower(), encoding="utf-8"
                    )
    return target_path


# ---------------------------------------------------------------------------
# 2. EMA low-pass
# ---------------------------------------------------------------------------

def butter_lowpass(data: np.ndarray, cutoff: float = 10.0, fs: float = 100.0,
                   order: int = 5) -> np.ndarray:
    """``utility.butter_lowpass_filter`` (reference utility.py:504-510)."""
    b, a = butter(order, cutoff / (0.5 * fs), btype="low", analog=False)
    return filtfilt(b, a, data)


def lowpass_ema_dict(ema: Dict, cutoff=10.0, fs=100.0, order=5) -> Dict:
    """NaN-interpolate + low-pass each trajectory
    (reference data/dataset_hprc.py:2225-2303).  Handles both the nested
    sensor dicts and the flat palate dict."""

    def clean(vals):
        vals = np.asarray(vals, np.float64)
        if np.isnan(vals).any():
            vals = interpolate_nan(vals)
        return butter_lowpass(vals, cutoff, fs, order)

    out: Dict = {}
    for key, val in ema.items():
        if isinstance(val, dict):
            out[key] = {axis: clean(v) for axis, v in val.items()}
        else:
            out[key] = clean(val)
    return out


# ---------------------------------------------------------------------------
# 4. Tract-variable geometry
# ---------------------------------------------------------------------------

def compute_tvs(
    ema: Dict[str, Dict[str, np.ndarray]],
    palate: Dict[str, np.ndarray],
    median_llx: float,
    median_ttx: float,
    median_tbx: float,
    median_trx: float,
) -> Dict[str, np.ndarray]:
    """9 TVs from EMA geometry — vectorized over time, numerically identical
    to the reference's per-sample loops (data/dataset_hprc.py:1280-1349):

      LA  = ‖LL − UL‖ (x,z)           LP  = LLx − median(LLx)
      JA  = ‖JAW − UL‖ (x,z)
      T*CL = median(Sx) − Sx          for S ∈ {TT, TB, TR}
      T*CD = min over palate x∈[−50,0) of ‖(Sx, Sz) − (x, palate_z[−x−1])‖
    """
    def xz(sensor):
        return (np.asarray(ema[sensor]["x"], np.float64),
                np.asarray(ema[sensor]["z"], np.float64))

    llx, llz = xz("LL")
    ulx, ulz = xz("UL")
    jawx, jawz = xz("JAW")
    ttx, ttz = xz("TT")
    tbx, tbz = xz("TB")
    trx, trz = xz("TR")

    palate_z = np.asarray(palate["z"], np.float64)
    xs = np.arange(-50, 0, dtype=np.float64)          # candidate x positions
    pz = palate_z[(-xs).astype(int) - 1]              # palate_z[(-x)-1]

    def constriction_degree(sx, sz):
        d = np.sqrt((sx[:, None] - xs[None, :]) ** 2 +
                    (sz[:, None] - pz[None, :]) ** 2)
        return d.min(axis=1)

    return {
        "LA": np.sqrt((llx - ulx) ** 2 + (llz - ulz) ** 2),
        "LP": llx - median_llx,
        "JA": np.sqrt((jawx - ulx) ** 2 + (jawz - ulz) ** 2),
        "TTCL": median_ttx - ttx,
        "TTCD": constriction_degree(ttx, ttz),
        "TMCL": median_tbx - tbx,
        "TMCD": constriction_degree(tbx, tbz),
        "TBCL": median_trx - trx,
        "TBCD": constriction_degree(trx, trz),
    }


def median_sensor_x(ema_files: List[Dict], sensor: str) -> float:
    """Speaker-level median of a sensor's x trajectory over all utterances
    (reference ``get_median_ema_x``, used at data/dataset_hprc.py:1266-1269)."""
    values = np.concatenate(
        [np.asarray(e[sensor]["x"], np.float64) for e in ema_files]
    )
    return float(np.nanmedian(values))


# ---------------------------------------------------------------------------
# 5. Normalization variants
# ---------------------------------------------------------------------------

def zscore_utterance(tvs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Per-utterance z-score — the blessed variant
    (reference data/dataset_hprc.py:775-833, chosen at :2610 '-> best').
    NaNs that survive (zero variance) are replaced by 0."""
    out = {}
    for k, v in tvs.items():
        v = np.asarray(v, np.float64)
        norm = (v - np.nanmean(v)) / np.nanstd(v)
        out[k] = np.nan_to_num(norm, nan=0.0)
    return out


def minmax_speaker(tvs: Dict[str, np.ndarray],
                   spk_min: Dict[str, float],
                   spk_max: Dict[str, float]) -> Dict[str, np.ndarray]:
    """Speaker-level min-max (reference data/dataset_hprc.py:837-898)."""
    return {
        k: (np.asarray(v, np.float64) - spk_min[k])
        / (spk_max[k] - spk_min[k])
        for k, v in tvs.items()
    }


def zscore_speaker(tvs: Dict[str, np.ndarray],
                   spk_mean: Dict[str, float],
                   spk_std: Dict[str, float]) -> Dict[str, np.ndarray]:
    """Speaker-level z-score (reference data/dataset_hprc.py:902-962)."""
    return {
        k: (np.asarray(v, np.float64) - spk_mean[k]) / spk_std[k]
        for k, v in tvs.items()
    }


def speaker_stats(tv_files: List[Dict[str, np.ndarray]]):
    """(min, max, mean, std) per TV over a speaker's utterances."""
    stats_min, stats_max, stats_mean, stats_std = {}, {}, {}, {}
    for k in TV_ORDER:
        allv = np.concatenate([np.asarray(t[k], np.float64) for t in tv_files])
        stats_min[k] = float(np.nanmin(allv))
        stats_max[k] = float(np.nanmax(allv))
        stats_mean[k] = float(np.nanmean(allv))
        stats_std[k] = float(np.nanstd(allv))
    return stats_min, stats_max, stats_mean, stats_std


def _minmax_to_unit_range(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Min-max scale to [-1, 1]: ``-1 + 2 (v - lo) / (hi - lo)``
    (reference data/dataset_hprc.py:1049-1053)."""
    return -1.0 + (np.asarray(v, np.float64) - lo) * 2.0 / (hi - lo)


def global_stats(
    tv_files: List[Dict[str, np.ndarray]],
    rates: List[str],
    rate: str = "both",
):
    """Cross-speaker, rate-constrained stats for the *global* normalization
    scheme (reference ``hprc_tvs_norm``, data/dataset_hprc.py:968-1242):

      1. per-TV global min/max over the raw TVs of every utterance whose
         rate matches (``get_min_max_hprc``, :1450-1594);
      2. per-TV mean/std computed over the *min-max-normalized* values of
         those utterances (``get_mean_std``, :1390-1447).

    Args:
      tv_files: one raw TV dict per utterance (all speakers pooled).
      rates: the utterance rate ('N'/'F') per entry, same order.
      rate: 'N' | 'F' | 'both' — which utterances constrain the stats.

    Returns ``(gmin, gmax, gmean, gstd)`` dicts keyed by TV name.
    """
    assert rate in ("N", "F", "both")
    assert len(tv_files) == len(rates)
    sel = [t for t, r in zip(tv_files, rates) if rate == "both" or r == rate]
    if not sel:
        raise ValueError(f"no utterances match rate={rate!r}")
    gmin, gmax, gmean, gstd = {}, {}, {}, {}
    for k in TV_ORDER:
        allv = np.concatenate([np.asarray(t[k], np.float64) for t in sel])
        gmin[k] = float(np.nanmin(allv))
        gmax[k] = float(np.nanmax(allv))
        scaled = _minmax_to_unit_range(allv, gmin[k], gmax[k])
        gmean[k] = float(np.nanmean(scaled))
        gstd[k] = float(np.nanstd(scaled))
    return gmin, gmax, gmean, gstd


def minmax_zscore_global(
    tvs: Dict[str, np.ndarray],
    gmin: Dict[str, float],
    gmax: Dict[str, float],
    gmean: Dict[str, float],
    gstd: Dict[str, float],
) -> Dict[str, np.ndarray]:
    """The global normalization variant: per-TV min-max to [-1, 1] with the
    cross-speaker range, then z-score with the cross-speaker moments of the
    scaled data (reference data/dataset_hprc.py:1123-1139; stats from
    :func:`global_stats`).  Completes the 4-scheme set promised by
    SURVEY.md C11 (utterance z-score, speaker min-max, speaker z-score,
    global min-max+z-score)."""
    out = {}
    for k, v in tvs.items():
        scaled = _minmax_to_unit_range(v, gmin[k], gmax[k])
        out[k] = (scaled - gmean[k]) / gstd[k]
    return out


# ---------------------------------------------------------------------------
# 6. Frame-rate interpolation
# ---------------------------------------------------------------------------

def interpolate_signal(sig: np.ndarray, target_len: int) -> np.ndarray:
    """Linear resample to ``target_len`` samples
    (reference data/dataset_hprc.py:2307-2313)."""
    sig = np.asarray(sig, np.float64)
    src = np.arange(len(sig), dtype=np.float64)
    dst = np.linspace(0, len(sig) - 1, target_len)
    return np.interp(dst, src, sig)


def encoder_frames_for_audio(num_samples: int,
                             cfg: Optional[Wav2Vec2Config] = None) -> int:
    """Encoder output length T for a waveform — closed form, replacing the
    reference's load-a-checkpoint-and-run-it approach
    (data/dataset_hprc.py:2328-2341)."""
    cfg = cfg or Wav2Vec2Config()
    return int(cfg.feat_extract_output_lengths(np.asarray(num_samples)))


def interpolate_tvs_to_frames(tvs: Dict[str, np.ndarray],
                              num_audio_samples: int,
                              cfg: Optional[Wav2Vec2Config] = None):
    """All 9 TVs linearly resampled to the encoder frame count
    (reference data/dataset_hprc.py:2316-2423)."""
    t = encoder_frames_for_audio(num_audio_samples, cfg)
    return {k: interpolate_signal(v, t) for k, v in tvs.items()}


# ---------------------------------------------------------------------------
# 7. Frame-level phoneme labels
# ---------------------------------------------------------------------------

def match_phonemes_to_frames(phoneme_boundaries: List[float],
                             phoneme_list: List,
                             frame_duration: float = 0.02) -> List:
    """``utility.match_phonemes_to_frames`` (reference utility.py:312-342):
    walk 20 ms frames over the centisecond grid; a frame takes the first
    phoneme whose *start boundary* falls inside it, else carries the
    previous frame's phoneme."""
    matched, current = [], None
    stop = int(phoneme_boundaries[-1] * 100) + 1
    step = int(frame_duration * 100)
    for frame_start in range(0, stop, step):
        frame_end = frame_start + step
        overlapping = [
            p for p, b in zip(phoneme_list, phoneme_boundaries)
            if frame_start / 100.0 <= b < frame_end / 100.0
        ]
        if overlapping:
            current = overlapping[0]
        matched.append(current)
    return matched


def phoneme_frame_labels(timestamps: List[float], phoneme_ids: List[int],
                         num_audio_samples: int,
                         cfg: Optional[Wav2Vec2Config] = None) -> List[int]:
    """Frame ids at the encoder rate, truncated/aligned to the true frame
    count T (reference data/dataset_hprc.py:2467-2484)."""
    ts = list(timestamps)
    ts[-1] = round(ts[-1], 2)
    frames = match_phonemes_to_frames(ts, phoneme_ids, 0.02)
    t = encoder_frames_for_audio(num_audio_samples, cfg)
    diff = abs(len(frames) - t)
    if diff:
        frames = frames[:-diff] if len(frames) > t else frames + [frames[-1]] * diff
    assert len(frames) == t
    return frames


# ---------------------------------------------------------------------------
# Acoustic feature prep (mspec / mfcc / F0) + auxiliary smoothing
# ---------------------------------------------------------------------------

def compute_utterance_mspec(wav_16k: np.ndarray) -> np.ndarray:
    """Normalized log-mel spectrogram, ``utility.compute_mspec`` contract
    (reference utility.py:84-95) → (frames, 80)."""
    import jax.numpy as jnp

    from aptai_tpu.ops.signal import melspectrogram

    return np.asarray(melspectrogram(jnp.asarray(wav_16k, jnp.float32)))


def mspec_znorm(mspec: np.ndarray) -> np.ndarray:
    """Per-utterance per-bin z-score (reference data/dataset_hprc.py:1754-1797)."""
    mean = np.mean(mspec, axis=0)
    std = np.std(mspec, axis=0)
    return (mspec - mean) / std


def compute_utterance_mfcc(wav_16k: np.ndarray, n_mfcc: int = 13) -> np.ndarray:
    """MFCCs with the reference's ~49 Hz hop (``int(16000/49) − 4`` = 322,
    reference data/dataset_hprc.py:1800-1847) → (n_mfcc, frames) like librosa."""
    import jax.numpy as jnp

    from aptai_tpu.ops.signal import mfcc

    hop = int(SAMPLE_RATE / 49) - 4
    out = np.asarray(mfcc(jnp.asarray(wav_16k, jnp.float32), n_mfcc=n_mfcc,
                          n_fft=1024, hop_length=hop, fmin=90.0, fmax=7600.0))
    return out.T


def nccf_pitch(
    wav: np.ndarray,
    fs: int = SAMPLE_RATE,
    hop_length: int = 256,
    lo: float = 50.0,
    hi: float = 600.0,
    voicing_threshold: float = 0.3,
) -> np.ndarray:
    """Dependency-free F0 tracker: normalized cross-correlation (the NCCF
    at the core of RAPT — D. Talkin, "A Robust Algorithm for Pitch
    Tracking", 1995) with parabolic peak interpolation and an
    NCCF-threshold voicing decision.

    Stands in for ``pysptk.sptk.rapt(..., otype=1)`` (used by the reference
    at data/dataset_hprc.py:1959): one F0 value in Hz per ``hop_length``
    samples, 0.0 for unvoiced frames.
    """
    wav = np.asarray(wav, np.float64)
    wav = wav - np.mean(wav)
    lag_min = max(int(fs / hi), 2)
    lag_max = int(np.ceil(fs / lo))
    win = lag_max  # ≥ one period of the lowest trackable F0
    n_frames = 1 + len(wav) // hop_length  # pysptk rapt frame count
    need = (n_frames - 1) * hop_length + win + lag_max + 1
    if need > len(wav):
        wav = np.pad(wav, (0, need - len(wav)))

    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(win + lag_max + 1)[None, :]
    frames = wav[idx]                                # (F, win+lag_max+1)
    base = frames[:, :win]                           # (F, win)
    e0 = np.sum(base * base, axis=1)                 # (F,)

    lags = np.arange(lag_min, lag_max + 1)
    nccf = np.zeros((n_frames, len(lags)))
    for j, k in enumerate(lags):
        shifted = frames[:, k : k + win]
        ek = np.sum(shifted * shifted, axis=1)
        denom = np.sqrt(e0 * ek)
        num = np.sum(base * shifted, axis=1)
        nccf[:, j] = np.where(denom > 0, num / np.maximum(denom, 1e-12), 0.0)

    best = np.argmax(nccf, axis=1)                   # (F,)
    peak = nccf[np.arange(n_frames), best]

    # parabolic interpolation around the NCCF peak for sub-sample lag
    prev_i = np.clip(best - 1, 0, len(lags) - 1)
    next_i = np.clip(best + 1, 0, len(lags) - 1)
    y0 = nccf[np.arange(n_frames), prev_i]
    y1 = peak
    y2 = nccf[np.arange(n_frames), next_i]
    denom = y0 - 2 * y1 + y2
    shift = np.where(np.abs(denom) > 1e-12,
                     0.5 * (y0 - y2) / np.where(denom == 0, 1, denom), 0.0)
    shift = np.clip(shift, -0.5, 0.5)
    lag = lags[best] + shift

    # voicing: strong periodicity AND non-trivial frame energy
    energy_gate = e0 > 1e-6 * max(float(np.max(e0)), 1e-12)
    voiced = (peak >= voicing_threshold) & energy_gate
    return np.where(voiced, fs / lag, 0.0)


def compute_f0_rapt(wav_16k: np.ndarray, speaker: str,
                    hop_length: int = 256) -> np.ndarray:
    """F0 with the reference's per-gender ranges
    (reference data/dataset_hprc.py:1935-2003; M: 50–250 Hz, F: 100–600 Hz).
    Uses ``pysptk``'s RAPT when installed, otherwise the in-repo NCCF
    tracker (:func:`nccf_pitch`) — the pipeline never loses the F0 feature
    to a missing dependency."""
    lo, hi = (50, 250) if speaker.startswith("M") else (100, 600)
    try:
        import pysptk as sptk
    except ImportError:
        return nccf_pitch(wav_16k, SAMPLE_RATE, hop_length, lo, hi)
    return sptk.rapt((np.asarray(wav_16k, np.float32) * 32768), SAMPLE_RATE,
                     hop_length, min=lo, max=hi, otype=1)


def compute_f0_mspec(wav_16k: np.ndarray, speaker: str):
    """The combined per-utterance F0 + mel-spectrogram feature
    (reference data/dataset_hprc.py:1935-2003 ``hprc_f0_mspec``): F0 at the
    speaker-sex-dependent range with hop 256 and the normalized log-mel
    spectrogram on the same 256-sample hop (one F0 value per mspec frame
    grid step).  Returns ``(f0, mspec)``."""
    f0 = compute_f0_rapt(wav_16k, speaker, hop_length=256)
    mspec = compute_utterance_mspec(wav_16k)
    return f0, mspec


def _iter_speaker_wavs(prep_path: Path):
    for spk_dir in sorted(p for p in Path(prep_path).iterdir() if p.is_dir()):
        audio_dir = spk_dir / "audio"
        if not audio_dir.exists():
            continue
        for wav in sorted(audio_dir.glob("*.wav")):
            yield spk_dir, wav


def _dump(path: Path, obj) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def write_acoustic_features(prep_path, replace: bool = False,
                            znorm_mspec: bool = False,
                            features=("f0", "mspec", "mfccs")) -> int:
    """Corpus walker for the acoustic feature pickles: per utterance writes
    ``<spk>/f0/<utt>.pkl`` + ``<spk>/mspec/<utt>.pkl`` (reference
    ``hprc_f0_mspec``, data/dataset_hprc.py:1935-2003; znorm per
    ``hprc_mspec_znorm`` :1754-1797 when requested) and
    ``<spk>/mfccs/<utt>.pkl`` (``hprc_mfccs`` :1800-1847).  Skips existing
    files unless ``replace``; returns the number of utterances touched."""
    from aptai_tpu.data.audio_io import load_wav_16k

    written = 0
    for spk_dir, wav_path in _iter_speaker_wavs(prep_path):
        name = wav_path.stem
        targets = {feat: spk_dir / feat / (name + ".pkl")
                   for feat in features}
        todo = {feat: p for feat, p in targets.items()
                if replace or not p.exists()}
        if not todo:
            continue
        wav = load_wav_16k(wav_path)
        if "f0" in todo or "mspec" in todo:
            f0, mspec = compute_f0_mspec(wav, spk_dir.name)
            if znorm_mspec:
                mspec = mspec_znorm(mspec)
            if "f0" in todo:
                _dump(todo["f0"], f0)
            if "mspec" in todo:
                _dump(todo["mspec"], mspec)
        if "mfccs" in todo:
            _dump(todo["mfccs"], compute_utterance_mfcc(wav))
        written += 1
    return written


def gaussian_smooth_tvs(tvs: Dict[str, np.ndarray],
                        sigma: float = 2.0) -> Dict[str, np.ndarray]:
    """Gaussian TV smoothing variant (reference data/dataset_hprc.py:2535-2577
    ``last_step_tv_smoothing``, σ default 2)."""
    from scipy.ndimage import gaussian_filter1d

    return {k: gaussian_filter1d(np.asarray(v, np.float64), sigma)
            for k, v in tvs.items()}


def audio_duration_range(csv_path, path_column: str = "path_wav"):
    """(min, max) audio duration in seconds across a manifest —
    ``utility.min_audio_duration`` / ``max_audio_duration``
    (reference utility.py:248-294, incl. fixing the max-variant's
    undefined-variable bug)."""
    from aptai_tpu.data.audio_io import load_wav_16k

    df = pd.read_csv(csv_path)
    durations = [len(load_wav_16k(p)) / SAMPLE_RATE for p in df[path_column]]
    return min(durations), max(durations)


# ---------------------------------------------------------------------------
# 3. MAUS BAS web service client (network; offline-gated)
# ---------------------------------------------------------------------------

MAUS_BASE = "https://clarin.phonetik.uni-muenchen.de/BASWebServices/services"


def maus_g2p(audio_path, txt_path, language: str = "eng") -> str:
    """G2P + forced alignment via the BAS CLARIN ``runPipeline`` REST API
    (reference utility.py:142-186).  Returns the TextGrid download link.
    Requires network access; callers in prep gate on availability."""
    import xml.etree.ElementTree as et

    import requests

    status = requests.get(f"{MAUS_BASE}/getLoadIndicator", timeout=30)
    if status.status_code == 200 and status.text.strip() == "2":
        raise RuntimeError("MAUS server load is too high")
    with open(audio_path, "rb") as a_f, open(txt_path, "rb") as t_f:
        res = requests.post(
            f"{MAUS_BASE}/runPipeline",
            files={
                "SIGNAL": a_f,
                "TEXT": t_f,
                "PIPE": (None, "G2P_MAUS"),
                "LANGUAGE": (None, language),
                "OUTFORMAT": (None, "TextGrid"),
                "OUTSYMBOL": (None, "ipa"),
                "USETEXTENHANCE": (None, "false"),
            },
            timeout=600,
        )
    res.raise_for_status()
    return et.fromstring(res.text).find("downloadLink").text


def run_maus_alignment(prep_path, replace: bool = False,
                       language: str = "eng") -> int:
    """Forced-align every prepared utterance through MAUS, writing
    ``<prep>/<spk>/phonemes/<utt>.TextGrid``
    (reference data/dataset_hprc.py:439-472, ``hprc_phoneme``).
    Skips files that already exist unless ``replace``; returns #downloaded.
    Requires network access."""
    import requests

    prep_path = Path(prep_path)
    downloaded = 0
    for spk_dir in sorted(p for p in prep_path.iterdir() if p.is_dir()):
        audio_dir = spk_dir / "audio"
        if not audio_dir.exists():
            continue
        phn_dir = spk_dir / "phonemes"
        phn_dir.mkdir(exist_ok=True)
        for wav in sorted(audio_dir.glob("*.wav")):
            target = phn_dir / (wav.stem + ".TextGrid")
            if target.exists() and not replace:
                continue
            link = maus_g2p(wav, spk_dir / "text" / (wav.stem + ".txt"),
                            language=language)
            res = requests.get(link, allow_redirects=True, timeout=120)
            res.raise_for_status()
            target.write_bytes(res.content)
            downloaded += 1
    return downloaded


# ---------------------------------------------------------------------------
# 8. Manifest
# ---------------------------------------------------------------------------

def build_hprc_csv(prep_path) -> Path:
    """Build ``hprc.csv``: one N and one F file per utterance (first
    repetition R01 only), with phoneme labels/boundary timestamps from the
    MAUS TextGrids (reference data/dataset_hprc.py:141-225)."""
    prep_path = Path(prep_path)
    rows, index = [], 0
    for spk_dir in sorted(p for p in prep_path.iterdir() if p.is_dir()):
        spk = spk_dir.name
        audio_dir = spk_dir / "audio"
        if not audio_dir.exists():
            continue
        for wav in sorted(audio_dir.glob("*.wav")):
            if "R01" not in wav.stem:
                continue
            name = wav.stem
            text = (spk_dir / "text" / (name + ".txt")).read_text().rstrip()
            labels, ts_tuples = textgrid_phonemes(
                spk_dir / "phonemes" / (name + ".TextGrid")
            )
            # boundary list: starts of all phonemes + final end (ref :181-188)
            timestamps = [t[0] for t in ts_tuples] + [ts_tuples[-1][1]]
            rows.append([
                index, str(wav), spk, text, " ".join(labels), timestamps,
                name[-1],
                str(spk_dir / "tvs" / (name + ".pkl")),
                str(spk_dir / "tvs_49hz" / (name + ".pkl")),
                str(spk_dir / "tvs_norm" / (name + ".pkl")),
                str(spk_dir / "tvs_norm_49hz" / (name + ".pkl")),
                str(spk_dir / "mspec" / (name + ".pkl")),
                str(spk_dir / "mfccs" / (name + ".pkl")),
                str(spk_dir / "f0" / (name + ".pkl")),
            ])
            index += 1
    out = prep_path / "hprc.csv"
    with open(out, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow([
            "index", "path_wav", "speaker", "text", "phoneme_labels",
            "phoneme_timestamps", "rate", "path_tvs", "path_tvs_49hz",
            "path_tvs_norm", "path_tvs_norm_49hz", "path_mspec", "path_mfccs",
            "path_f0",
        ])
        w.writerows(rows)
    return out


def add_phn_frames_to_csv(csv_path, vocab: Dict[str, int],
                          cfg: Optional[Wav2Vec2Config] = None) -> None:
    """Add the ``phn_frames_49hz`` column (reference
    data/dataset_hprc.py:2428-2488).  Like the reference, the blank token is
    removed from the vocab before mapping (so id 0 never appears as a target
    — it is the CE ignore index)."""
    import ast

    from aptai_tpu.data.vocab import phonemes_to_ids

    df = pd.read_csv(csv_path)
    vocab_noblank = {k: v for k, v in vocab.items() if k != "(blank)"}
    col = []
    for _, row in df.iterrows():
        ids = phonemes_to_ids(vocab_noblank, row.phoneme_labels)
        audio, _ = load_wav(row.path_wav)
        ts = ast.literal_eval(str(row.phoneme_timestamps))
        col.append(phoneme_frame_labels(ts, ids, len(audio), cfg))
    df["phn_frames_49hz"] = col
    df.to_csv(csv_path, index=False)


# ---------------------------------------------------------------------------
# Corpus walkers (steps 2, 4–7 over a whole prepared tree) + driver
# ---------------------------------------------------------------------------

def _load_pkl(path: Path):
    with open(path, "rb") as f:
        return pickle.load(f)


def write_lowpass_ema(prep_path, replace: bool = False) -> int:
    """NaN-interpolate + Butterworth-low-pass every EMA pickle into
    ``<spk>/ema_low/`` (reference ``hprc_lowpass_ema``,
    data/dataset_hprc.py:2225-2303; palate traces pass through smoothed
    too, matching the reference's treatment of every trajectory)."""
    written = 0
    for spk_dir in sorted(p for p in Path(prep_path).iterdir() if p.is_dir()):
        ema_dir = spk_dir / "ema"
        if not ema_dir.exists():
            continue
        for pkl in sorted(ema_dir.glob("*.pkl")):
            target = spk_dir / "ema_low" / pkl.name
            if target.exists() and not replace:
                continue
            _dump(target, lowpass_ema_dict(_load_pkl(pkl)))
            written += 1
    return written


def write_tvs(prep_path, lowpass: bool = True, replace: bool = False) -> int:
    """9-TV geometry per utterance into ``<spk>/tvs/`` (reference
    ``hprc_tvs``, data/dataset_hprc.py:1247-1364): speaker-level sensor-x
    medians over all of the speaker's utterances, palate trace from
    ``<spk>_palate.pkl``."""
    written = 0
    for spk_dir in sorted(p for p in Path(prep_path).iterdir() if p.is_dir()):
        ema_dir = spk_dir / ("ema_low" if lowpass else "ema")
        if not ema_dir.exists():
            continue
        palate_pkl = ema_dir / f"{spk_dir.name}_palate.pkl"
        utt_pkls = [p for p in sorted(ema_dir.glob("*.pkl"))
                    if "palate" not in p.name]
        if not palate_pkl.exists() or not utt_pkls:
            continue
        palate = _load_pkl(palate_pkl)
        emas = [_load_pkl(p) for p in utt_pkls]
        medians = dict(
            median_llx=median_sensor_x(emas, "LL"),
            median_ttx=median_sensor_x(emas, "TT"),
            median_tbx=median_sensor_x(emas, "TB"),
            median_trx=median_sensor_x(emas, "TR"),
        )
        for pkl, ema in zip(utt_pkls, emas):
            target = spk_dir / "tvs" / pkl.name
            if target.exists() and not replace:
                continue
            _dump(target, compute_tvs(ema, palate, **medians))
            written += 1
    return written


def write_tv_norm(prep_path, scheme: str = "zscore_utterance",
                  rate: str = "both", replace: bool = False) -> int:
    """Normalize every TV pickle into ``<spk>/tvs_norm/`` using one of the
    four schemes (reference step 2.5, data/dataset_hprc.py:2604-2611;
    ``zscore_utterance`` is the blessed variant, ':2610 -> best')."""
    prep_path = Path(prep_path)
    spk_dirs = sorted(p for p in prep_path.iterdir() if p.is_dir())

    def utt_rate(name: str) -> str:
        return name.rsplit("_", 1)[-1].split(".")[0]

    if scheme == "minmax_zscore_global":
        tv_files, rates = [], []
        for spk_dir in spk_dirs:
            for pkl in sorted((spk_dir / "tvs").glob("*.pkl")):
                tv_files.append(_load_pkl(pkl))
                rates.append(utt_rate(pkl.stem))
        gstats = global_stats(tv_files, rates, rate)

    written = 0
    for spk_dir in spk_dirs:
        tvs_dir = spk_dir / "tvs"
        if not tvs_dir.exists():
            continue
        pkls = sorted(tvs_dir.glob("*.pkl"))
        if scheme in ("minmax_speaker", "zscore_speaker"):
            smin, smax, smean, sstd = speaker_stats(
                [_load_pkl(p) for p in pkls]
            )
        for pkl in pkls:
            target = spk_dir / "tvs_norm" / pkl.name
            if target.exists() and not replace:
                continue
            tvs = _load_pkl(pkl)
            if scheme == "zscore_utterance":
                norm = zscore_utterance(tvs)
            elif scheme == "minmax_speaker":
                norm = minmax_speaker(tvs, smin, smax)
            elif scheme == "zscore_speaker":
                norm = zscore_speaker(tvs, smean, sstd)
            elif scheme == "minmax_zscore_global":
                norm = minmax_zscore_global(tvs, *gstats)
            else:
                raise ValueError(f"unknown normalization scheme {scheme!r}")
            _dump(target, norm)
            written += 1
    return written


def write_tvs_49hz(prep_path, cfg: Optional[Wav2Vec2Config] = None,
                   replace: bool = False) -> int:
    """Interpolate raw and normalized TVs to the encoder frame count into
    ``<spk>/tvs_49hz/`` and ``<spk>/tvs_norm_49hz/`` (reference
    ``interpolate_TVs_49hz``, data/dataset_hprc.py:2316-2423 — without
    loading a checkpoint; T from the closed-form conv formula)."""
    from aptai_tpu.data.audio_io import load_wav_16k

    written = 0
    for spk_dir, wav_path in _iter_speaker_wavs(prep_path):
        name = wav_path.stem + ".pkl"
        n_samples = None
        for src, dst in (("tvs", "tvs_49hz"), ("tvs_norm", "tvs_norm_49hz")):
            src_pkl = spk_dir / src / name
            target = spk_dir / dst / name
            if not src_pkl.exists() or (target.exists() and not replace):
                continue
            if n_samples is None:
                n_samples = len(load_wav_16k(wav_path))
            _dump(target, interpolate_tvs_to_frames(
                _load_pkl(src_pkl), n_samples, cfg))
            written += 1
    return written


def prepare_hprc(
    raw_path=None,
    prep_path=None,
    norm_scheme: str = "zscore_utterance",
    norm_rate: str = "both",
    run_maus: bool = False,
    replace: bool = False,
    vocab_path=None,
    cfg: Optional[Wav2Vec2Config] = None,
    log=print,
) -> Path:
    """The 8-step offline pipeline in the reference's blessed order
    (data/dataset_hprc.py __main__:2580-2622), as one resumable driver:

      1. :func:`extract_mat`            (skipped when ``raw_path`` is None)
      2. :func:`write_acoustic_features`  — f0 + mspec + mfccs
      3. :func:`run_maus_alignment`     (network; off by default — existing
                                         ``<spk>/phonemes/*.TextGrid`` are
                                         used as-is)
      4. :func:`write_lowpass_ema`
      5. :func:`write_tvs`
      6. :func:`write_tv_norm`          (blessed: zscore_utterance)
      7. :func:`write_tvs_49hz`
      8. :func:`build_hprc_csv` + :func:`add_phn_frames_to_csv`

    Every step skips already-existing outputs unless ``replace`` — rerunning
    after an interruption resumes where it left off.  Returns the manifest
    path."""
    from aptai_tpu.data.vocab import build_vocab, load_vocab, save_vocab

    if raw_path is None and prep_path is None:
        raise ValueError("need raw_path and/or prep_path")
    if prep_path is None:
        prep_path = Path(str(raw_path) + "_prep")
    prep_path = Path(prep_path)

    if raw_path is not None:
        log(f"[1/8] extract_mat {raw_path} -> {prep_path}")
        extract_mat(raw_path, prep_path)
    else:
        log("[1/8] extract_mat skipped (no raw_path)")

    log("[2/8] acoustic features (f0 + mspec + mfccs)")
    n = write_acoustic_features(prep_path, replace=replace)
    log(f"      {n} utterances")

    if run_maus:
        log("[3/8] MAUS forced alignment (network)")
        n = run_maus_alignment(prep_path, replace=replace)
        log(f"      {n} TextGrids downloaded")
    else:
        log("[3/8] MAUS skipped (using existing <spk>/phonemes/ TextGrids)")

    log("[4/8] EMA low-pass")
    log(f"      {write_lowpass_ema(prep_path, replace=replace)} pickles")

    log("[5/8] tract variables")
    log(f"      {write_tvs(prep_path, replace=replace)} pickles")

    log(f"[6/8] TV normalization ({norm_scheme}, rate={norm_rate})")
    log(f"      {write_tv_norm(prep_path, norm_scheme, norm_rate, replace)}"
        " pickles")

    log("[7/8] 49 Hz interpolation")
    log(f"      {write_tvs_49hz(prep_path, cfg, replace=replace)} pickles")

    log("[8/8] manifest + frame labels")
    csv_path = build_hprc_csv(prep_path)
    if vocab_path is not None and Path(vocab_path).exists():
        vocab = load_vocab(vocab_path)
    else:
        vocab = build_vocab(pd.read_csv(csv_path).phoneme_labels)
        save_vocab(vocab, prep_path / "vocab.json")
    add_phn_frames_to_csv(csv_path, vocab, cfg)
    log(f"      {csv_path}")
    return csv_path


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m aptai_tpu.data.hprc_prep",
        description="HPRC offline preparation pipeline "
                    "(reference data/dataset_hprc.py __main__:2580-2649)",
    )
    ap.add_argument("raw", nargs="?", default=None,
                    help="raw HPRC release (.mat tree); omit with --prep to "
                         "resume on an already-extracted tree")
    ap.add_argument("--prep", default=None,
                    help="prepared output tree (default: <raw>_prep)")
    ap.add_argument("--norm", default="zscore_utterance",
                    choices=["zscore_utterance", "minmax_speaker",
                             "zscore_speaker", "minmax_zscore_global"],
                    help="TV normalization scheme (reference blessed: "
                         "zscore_utterance)")
    ap.add_argument("--norm_rate", default="both", choices=["N", "F", "both"],
                    help="rate constraint for the global scheme's stats")
    ap.add_argument("--run_maus", action="store_true",
                    help="call the MAUS BAS web service (network)")
    ap.add_argument("--replace", action="store_true",
                    help="recompute outputs that already exist")
    ap.add_argument("--vocab", default=None,
                    help="vocab.json for frame labels (default: built from "
                         "the manifest and saved to <prep>/vocab.json)")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for the signal ops (default cpu: "
                         "prep computes mspec/mfcc at a distinct audio "
                         "length per utterance, so an accelerator platform "
                         "recompiles per utterance and is strictly slower)")
    args = ap.parse_args(argv)

    import jax

    # jax_platforms only takes effect before the first backend query; when
    # main() is embedded in a process whose backend is already live (e.g.
    # called programmatically after device use), the update would be
    # silently ineffective — warn instead of letting the per-utterance
    # remote-compile trap (module docstring) reappear unannounced.
    try:  # private API — absent/moved in some jax versions (ADVICE r4)
        from jax._src import xla_bridge as _xb

        _backend_live = _xb.backends_are_initialized()
    except Exception:
        _backend_live = False  # best-effort: fall through to the update

    if _backend_live:
        live = jax.default_backend()
        if live != args.platform:
            print(
                f"WARNING: jax backend already initialized as '{live}'; "
                f"--platform {args.platform} cannot take effect in this "
                "process — signal ops will run on the live backend",
                file=sys.stderr,
            )
    else:
        jax.config.update("jax_platforms", args.platform)
    prepare_hprc(args.raw, args.prep, args.norm, args.norm_rate,
                 run_maus=args.run_maus, replace=args.replace,
                 vocab_path=args.vocab)


if __name__ == "__main__":
    main()
