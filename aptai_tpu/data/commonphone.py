"""CommonPhone dataset (CTC phoneme-recognition corpus).

Rebuild of reference data/dataset_commonphone.py: a manifest-driven dataset
yielding ``{audio, audio_len, phoneme_label}`` items, with optional random
1-second cropping that re-windows the phoneme labels to the crop
(reference dataset_commonphone.py:35-72), plus the offline CSV builders.
"""

from __future__ import annotations

import ast
import csv
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from aptai_tpu import SAMPLE_RATE
from aptai_tpu.data.audio_io import load_wav_16k
from aptai_tpu.data.textgrid import textgrid_phonemes, parse_textgrid
from aptai_tpu.data.vocab import phonemes_to_ids


def parse_timestamp_tuples(s: str):
    """``utility.convert_ts_float`` (reference utility.py:298-309): parse the
    CSV-serialized list of (start, end) tuples."""
    return [tuple(map(float, t)) for t in ast.literal_eval(str(s))]


class CommonPhoneDataset:
    """Map-style dataset over a CommonPhone manifest DataFrame.

    __getitem__ contract = reference dataset_commonphone.py:27-83:
    resample to 16 kHz; with ``cropping`` pick a random 1 s window and keep
    the phoneme span [first phoneme containing crop-start .. phoneme
    containing crop-end].
    """

    CROP_SECONDS = 1.0

    def __init__(self, df: pd.DataFrame, vocab: Dict[str, int],
                 cropping: bool = False, seed: int = 0):
        self.df = df.reset_index(drop=True)
        self.vocab = vocab
        self.cropping = cropping
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, index: int) -> Dict:
        row = self.df.iloc[index]
        audio = load_wav_16k(row.path)

        if self.cropping:
            n_crop = int(self.CROP_SECONDS * SAMPLE_RATE)
            start = int(self._rng.integers(0, max(len(audio) - n_crop, 1)))
            end = start + n_crop
            cropped = audio[start:end]

            start_s, end_s = start / SAMPLE_RATE, end / SAMPLE_RATE
            ts = parse_timestamp_tuples(row.phoneme_timestamps)
            first = next(i for i, (a, b) in enumerate(ts) if a <= start_s < b)
            last = next(i for i, (a, b) in enumerate(ts) if a < end_s <= b)
            tokens = str(row.phonemes).split(" ")[first : last + 1]
            label = phonemes_to_ids(self.vocab, tokens)
            audio = cropped
        else:
            label = phonemes_to_ids(self.vocab, row.phonemes)

        return {
            "audio": np.asarray(audio, np.float32),
            "audio_len": len(audio),
            "phoneme_label": np.asarray(label, np.int32),
        }


def commonphone_csv(cp_path, langs: Optional[List[str]] = None):
    """Build ``commonphone.csv`` from a CommonPhone corpus directory
    (reference dataset_commonphone.py:90-217): one row per utterance with
    columns index, lang, path, speaker, text, phonemes, phoneme_timestamps,
    split — phonemes/timestamps read from the MAUS TextGrids."""
    langs = langs or ["en"]
    valid = {"de", "en", "es", "fr", "it", "ru"}
    if not set(langs) <= valid:
        raise ValueError(f"languages must be in {sorted(valid)}")
    cp_path = Path(cp_path)
    rows, index = [], 0
    for lang in sorted(os.listdir(cp_path)):
        if lang not in langs:
            continue
        for split_file, split in (("train.csv", "train"), ("dev.csv", "val"),
                                  ("test.csv", "test")):
            split_df = pd.read_csv(cp_path / lang / split_file)
            for _, r in split_df.iterrows():
                wav = str(r["audio file"]).rsplit(".", 1)[0] + ".wav"
                path = cp_path / lang / "wav" / wav
                grid = cp_path / lang / "grids" / (wav[:-4] + ".TextGrid")
                labels, timestamps = textgrid_phonemes(grid)
                tiers = parse_textgrid(grid)
                words = [iv.text for iv in tiers.get("ORT-MAU", []) if iv.text]
                rows.append([
                    index, lang, str(path), r["id"], " ".join(words),
                    " ".join(labels), timestamps, split,
                ])
                index += 1
    out = cp_path.parent / "commonphone.csv"
    with open(out, "w", encoding="utf-8", newline="") as f:
        w = csv.writer(f)
        w.writerow(["index", "lang", "path", "speaker", "text", "phonemes",
                    "phoneme_timestamps", "split"])
        w.writerows(rows)
    return out


def remap_speakers(csv_path) -> None:
    """Speaker string → int labels (reference dataset_commonphone.py:281-304)."""
    df = pd.read_csv(csv_path)
    mapping = {spk: i for i, spk in enumerate(df["speaker"].unique())}
    df["speaker"] = df["speaker"].map(mapping)
    df.to_csv(csv_path, index=False)


def trim_csv(csv_path, num_train=32, num_val=5, num_test=5, seed=0):
    """Debug-size manifest (reference dataset_commonphone.py:221-238)."""
    csv_path = Path(csv_path)
    df = pd.read_csv(csv_path)
    parts = [
        df[df.split == "train"].sample(num_train, random_state=seed),
        df[df.split == "val"].sample(num_val, random_state=seed),
        df[df.split == "test"].sample(num_test, random_state=seed),
    ]
    out = csv_path.parent / (csv_path.stem + "_trimmed.csv")
    pd.concat(parts).to_csv(out, index=False)
    return out
