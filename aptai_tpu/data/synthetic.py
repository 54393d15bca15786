"""Synthetic mini-corpora (the framework's answer to the reference's
``trim_CommonPhone_csv`` laptop fixture, dataset_commonphone.py:221-238).

Generates real on-disk corpora — wavs, TextGrids, TV pickles, manifests —
through the same files the real datasets read, so tests and the end-to-end
smoke exercise the production IO path, not mocks.
"""

from __future__ import annotations

import pickle
from pathlib import Path


import numpy as np
import pandas as pd

from aptai_tpu import SAMPLE_RATE, TV_ORDER
from aptai_tpu.data.audio_io import save_wav
from aptai_tpu.data.hprc import HPRC_SPEAKERS
from aptai_tpu.data.hprc_prep import (
    interpolate_tvs_to_frames,
    phoneme_frame_labels,
    zscore_utterance,
)
from aptai_tpu.data.vocab import build_vocab, phonemes_to_ids

_PHONES = ["(...)", "a", "e", "i", "o", "u", "k", "m", "s", "t"]


def _tone_for_phone(rng, phone: str, n: int) -> np.ndarray:
    """Distinct narrowband signal per phoneme so CTC training can learn."""
    f0 = 200 + 80 * (_PHONES.index(phone) if phone in _PHONES else 0)
    t = np.arange(n) / SAMPLE_RATE
    sig = 0.3 * np.sin(2 * np.pi * f0 * t)
    sig += 0.02 * rng.standard_normal(n)
    return sig.astype(np.float32)


def _random_utterance(rng, min_phones=3, max_phones=8,
                      phone_dur=(0.08, 0.25)):
    n_ph = int(rng.integers(min_phones, max_phones + 1))
    phones = ["(...)"] + list(rng.choice(_PHONES[1:], size=n_ph)) + ["(...)"]
    durations = rng.uniform(*phone_dur, size=len(phones))
    audio, bounds, cur = [], [], 0.0
    for p, d in zip(phones, durations):
        n = int(d * SAMPLE_RATE)
        audio.append(_tone_for_phone(rng, p, n))
        bounds.append((round(cur, 4), round(cur + n / SAMPLE_RATE, 4)))
        cur += n / SAMPLE_RATE
    return phones, bounds, np.concatenate(audio)


def make_synthetic_commonphone(root, num_train=8, num_val=2, num_test=2,
                               seed=0) -> Path:
    """CommonPhone-format manifest + wavs; returns the csv path."""
    root = Path(root)
    wav_dir = root / "wav"
    wav_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows, idx = [], 0
    for split, n in (("train", num_train), ("val", num_val), ("test", num_test)):
        for _ in range(n):
            phones, bounds, audio = _random_utterance(rng)
            path = wav_dir / f"utt_{idx:04d}.wav"
            save_wav(path, audio, SAMPLE_RATE)
            rows.append({
                "index": idx,
                "lang": "en",
                "path": str(path),
                "speaker": int(rng.integers(0, 4)),
                "text": "synthetic utterance",
                "phonemes": " ".join(phones),
                "phoneme_timestamps": [tuple(b) for b in bounds],
                "split": split,
            })
            idx += 1
    csv_path = root / "commonphone.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path


def _smooth_tv(rng, n: int) -> np.ndarray:
    """Band-limited random trajectory (sum of slow sinusoids)."""
    t = np.linspace(0, 1, n)
    sig = np.zeros(n)
    for k in range(1, 5):
        sig += rng.normal() * np.sin(2 * np.pi * k * t + rng.uniform(0, 6.28))
    return sig + rng.normal() * 2


# fixed per-(phoneme, TV) articulatory targets, so the synthetic TVs are a
# deterministic function of the audible phoneme sequence — an APTAI/FORCE
# model can actually LEARN them from the waveform (random trajectories
# would make TV losses pure noise-floor fitting)
_PHONE_TV_TARGETS = {
    p: np.cos(0.7 * i + 1.3 * np.arange(len(TV_ORDER)))
    for i, p in enumerate(_PHONES)
}


def _phone_driven_tvs(rng, phones, bounds, n: int, total_s: float):
    """Piecewise-constant per-phoneme TV targets, smoothed (~8 Hz moving
    average) + small noise — mimics articulator dynamics tied to content."""
    t_axis = np.linspace(0.0, total_s, n, endpoint=False)
    targets = np.zeros((n, len(TV_ORDER)))
    for p, (t0, t1) in zip(phones, bounds):
        sel = (t_axis >= t0) & (t_axis < t1)
        targets[sel] = _PHONE_TV_TARGETS[p]
    # moving-average smoothing over ~120 ms for articulator-like inertia
    win = max(int(0.12 * n / max(total_s, 1e-6)), 1)
    kernel = np.ones(win) / win
    smooth = np.stack(
        [np.convolve(targets[:, j], kernel, mode="same")
         for j in range(len(TV_ORDER))], axis=1)
    smooth += 0.05 * rng.standard_normal(smooth.shape)
    return {k: smooth[:, j].astype(np.float64)
            for j, k in enumerate(TV_ORDER)}


def make_synthetic_hprc(root, utts_per_speaker=2, speakers=None, seed=0,
                        cfg=None) -> Path:
    """HPRC-format prep tree + manifest: wavs, 4 TV pickle variants, mspec /
    mfcc pickles, phn_frames_49hz column; returns the csv path."""
    from aptai_tpu.ops.signal import melspectrogram, mfcc as mfcc_op

    root = Path(root)
    rng = np.random.default_rng(seed)
    speakers = speakers or HPRC_SPEAKERS[:4]
    vocab = build_vocab([" ".join(_PHONES)])
    vocab_noblank = {k: v for k, v in vocab.items() if k != "(blank)"}

    rows, idx = [], 0
    for spk in speakers:
        spk_dir = root / spk
        for d in ("audio", "tvs", "tvs_49hz", "tvs_norm", "tvs_norm_49hz",
                  "mspec", "mfccs"):
            (spk_dir / d).mkdir(parents=True, exist_ok=True)
        for u in range(utts_per_speaker):
            for rate in ("N", "F"):
                phones, bounds, audio = _random_utterance(rng)
                if rate == "F":
                    audio = audio[:: 2]  # crude fast-rate variant
                name = f"{spk}_S{u:02d}_R01_{rate}"
                wav_path = spk_dir / "audio" / (name + ".wav")
                save_wav(wav_path, audio, SAMPLE_RATE)

                n_ema = int(len(audio) / SAMPLE_RATE * 100)  # 100 Hz EMA
                total_s = len(audio) / SAMPLE_RATE
                scale = 0.5 if rate == "F" else 1.0  # F boundaries halve
                tvs = _phone_driven_tvs(
                    rng, phones,
                    [(b[0] * scale, b[1] * scale) for b in bounds],
                    max(n_ema, 8), total_s,
                )
                tvs_norm = zscore_utterance(tvs)
                tvs_49 = interpolate_tvs_to_frames(tvs, len(audio), cfg)
                tvs_norm_49 = interpolate_tvs_to_frames(tvs_norm, len(audio),
                                                        cfg)
                for sub, obj in (("tvs", tvs), ("tvs_49hz", tvs_49),
                                 ("tvs_norm", tvs_norm),
                                 ("tvs_norm_49hz", tvs_norm_49)):
                    with open(spk_dir / sub / (name + ".pkl"), "wb") as f:
                        pickle.dump(obj, f)

                mspec = np.asarray(melspectrogram(audio))
                mf = np.asarray(mfcc_op(audio))
                with open(spk_dir / "mspec" / (name + ".pkl"), "wb") as f:
                    pickle.dump(mspec, f)
                with open(spk_dir / "mfccs" / (name + ".pkl"), "wb") as f:
                    pickle.dump(mf, f)

                # boundary list like build_hprc_csv: starts + final end
                timestamps = [b[0] for b in bounds] + [bounds[-1][1]]
                # scale F-rate boundaries to the shortened audio
                if rate == "F":
                    timestamps = [t / 2 for t in timestamps]
                phn_ids = phonemes_to_ids(vocab_noblank, phones)
                frames = phoneme_frame_labels(timestamps, phn_ids, len(audio),
                                              cfg)
                rows.append({
                    "index": idx,
                    "path_wav": str(wav_path),
                    "speaker": spk,
                    "text": f"synthetic text {u}",
                    "phoneme_labels": " ".join(phones),
                    "phoneme_timestamps": [round(t, 4) for t in timestamps],
                    "rate": rate,
                    "path_tvs": str(spk_dir / "tvs" / (name + ".pkl")),
                    "path_tvs_49hz": str(spk_dir / "tvs_49hz" / (name + ".pkl")),
                    "path_tvs_norm": str(spk_dir / "tvs_norm" / (name + ".pkl")),
                    "path_tvs_norm_49hz": str(
                        spk_dir / "tvs_norm_49hz" / (name + ".pkl")),
                    "path_mspec": str(spk_dir / "mspec" / (name + ".pkl")),
                    "path_mfccs": str(spk_dir / "mfccs" / (name + ".pkl")),
                    "phn_frames_49hz": frames,
                })
                idx += 1
    csv_path = root / "hprc.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path
