"""Padding, collation, and shape-bucketed batching.

The reference uses per-batch dynamic padding via torch collators
(reference train/train_phoneme_recognizer.py:224-239,
train/train_aptai.py:268-332).  Under ``jit`` every new shape is a
recompile, so batches are padded up to *bucketed* static shapes
(audio to 1 s multiples, labels/frames to multiples of 16) — a handful of
compiled programs cover the whole corpus (SURVEY.md §7.3 item 4) while the
padding sentinels keep the reference's numerical contract:

  audio 0.0 · CTC labels −100 · frame phonemes 0 (CE ignore) · TVs −100.0
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Sequence

import numpy as np

from aptai_tpu import (
    AUDIO_PAD_VALUE,
    CTC_LABEL_PAD_ID,
    PHONEME_FRAME_PAD_ID,
    TV_PAD_VALUE,
)

AUDIO_BUCKET = 16_000   # pad audio to whole seconds
LABEL_BUCKET = 16
FRAME_BUCKET = 64


def _round_up(n: int, m: int) -> int:
    return max(int(math.ceil(n / m)) * m, m)


def _pad_to(x: np.ndarray, width: int, value) -> np.ndarray:
    pad = [(0, width - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad, constant_values=value)


def collate_ctc(items: Sequence[Dict], bucket: bool = True) -> Dict[str, np.ndarray]:
    """PR batch: {audio, audio_lengths, phoneme_labels}
    (reference train/train_phoneme_recognizer.py:224-239)."""
    a_w = max(len(x["audio"]) for x in items)
    l_w = max(len(x["phoneme_label"]) for x in items)
    if bucket:
        a_w = _round_up(a_w, AUDIO_BUCKET)
        l_w = _round_up(l_w, LABEL_BUCKET)
    return {
        "audio": np.stack(
            [_pad_to(np.asarray(x["audio"], np.float32), a_w, AUDIO_PAD_VALUE)
             for x in items]),
        "audio_lengths": np.asarray([x["audio_len"] for x in items], np.int32),
        "phoneme_labels": np.stack(
            [_pad_to(np.asarray(x["phoneme_label"], np.int32), l_w,
                     CTC_LABEL_PAD_ID) for x in items]),
    }


def collate_tv(items: Sequence[Dict], bucket: bool = True) -> Dict[str, np.ndarray]:
    """APTAI/FORCE batch: {audio, audio_lengths, phn_frames, tv_targets,
    phoneme_labels} with the reference's sentinels
    (reference train/train_aptai.py:268-332).  TVs come pre-stacked (T, 9)."""
    a_w = max(len(x["audio"]) for x in items)
    f_w = max(len(x["phn_frames_49hz"]) for x in items)
    if bucket:
        a_w = _round_up(a_w, AUDIO_BUCKET)
        f_w = _round_up(f_w, FRAME_BUCKET)
    l_w = _round_up(max(len(x["phoneme_label"]) for x in items), LABEL_BUCKET)
    return {
        "audio": np.stack(
            [_pad_to(np.asarray(x["audio"], np.float32), a_w, AUDIO_PAD_VALUE)
             for x in items]),
        "audio_lengths": np.asarray([x["audio_len"] for x in items], np.int32),
        "phn_frames": np.stack(
            [_pad_to(np.asarray(x["phn_frames_49hz"], np.int32), f_w,
                     PHONEME_FRAME_PAD_ID) for x in items]),
        "tv_targets": np.stack(
            [_pad_to(np.asarray(x["tvs_norm_49hz_array"], np.float32), f_w,
                     TV_PAD_VALUE) for x in items]),
        "phoneme_labels": np.stack(
            [_pad_to(np.asarray(x["phoneme_label"], np.int32), l_w,
                     CTC_LABEL_PAD_ID) for x in items]),
        "frame_lengths": np.asarray(
            [len(x["phn_frames_49hz"]) for x in items], np.int32),
    }


class BucketedLoader:
    """Length-bucketed batch iterator over a map-style dataset.

    Groups examples by padded audio width so each batch hits one of a small
    set of compiled shapes; shuffles within and across buckets per epoch.
    Exhausts every example each epoch (last partial batch of each bucket is
    repeated-padded to full batch size with ``batch_pad_mask`` marking real
    rows — keeping shapes static without dropping data).

    Multi-host data parallelism (new scope; the reference is single-process,
    SURVEY.md §2.3): with ``process_count > 1`` every process composes the
    *identical* global batch sequence (same seed → same permutation and
    bucketing) but materializes only its disjoint row shard
    ``[process_index·B/N, (process_index+1)·B/N)`` — so per-step shapes agree
    across hosts and the union of shards is exactly the single-process
    global batch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn,
        shuffle: bool = True,
        seed: int = 0,
        audio_bucket: int = AUDIO_BUCKET,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"process_count {process_count}"
            )
        if not 0 <= process_index < process_count:
            raise ValueError(f"process_index {process_index} out of range")
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.audio_bucket = audio_bucket
        self.process_index = process_index
        self.process_count = process_count
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        return math.ceil(len(self.dataset) / self.batch_size)

    @property
    def local_batch_size(self) -> int:
        return self.batch_size // self.process_count

    def _item_width(self, item) -> int:
        return _round_up(item["audio_len"], self.audio_bucket)

    def __iter__(self) -> Iterable[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1

        buckets: Dict[int, List] = {}
        for idx in order:
            item = self.dataset[int(idx)]
            width = self._item_width(item)
            buckets.setdefault(width, []).append(item)
            if len(buckets[width]) == self.batch_size:
                yield self._emit(buckets.pop(width))
        widths = list(buckets)
        if self.shuffle:
            self._rng.shuffle(widths)
        for width in widths:
            yield self._emit(buckets[width])

    def _emit(self, items: List[Dict]) -> Dict[str, np.ndarray]:
        real = len(items)
        while len(items) < self.batch_size:
            items.append(items[len(items) % real])
        mask = np.zeros(self.batch_size, bool)
        mask[:real] = True
        # collate globally (pad widths must agree across hosts), then slice
        # this process's row shard
        batch = self.collate_fn(items)
        batch["batch_pad_mask"] = mask
        if self.process_count > 1:
            lo = self.process_index * self.local_batch_size
            hi = lo + self.local_batch_size
            batch = {k: v[lo:hi] for k, v in batch.items()}
        return batch


class PrefetchLoader:
    """Background-thread prefetch over any batch iterable.

    The host-side analog of the reference's ``DataLoader(pin_memory=True)``
    worker prefetch (reference train/train_phoneme_recognizer.py:247-269):
    wav decode + collation for batch *i+1..i+depth* overlaps the device step
    for batch *i*.
    """

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def producer():
            try:
                for batch in self.loader:
                    q.put(batch)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
