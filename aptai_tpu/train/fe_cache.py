"""Frozen conv-FE feature cache for APTAI / PR training.

The conv feature extractor is FROZEN in the reference's APTAI default
(reference models/aptai.py:39-40) and under the PR trainer's
``--freeze_feature_extractor`` flag — yet both re-run its forward on the
same audio every step of every epoch.  The FE forward is the known
HBM-bound term of the train step (~13% of the blessed-shape APTAI step:
6.74 of 52.11 ms — benchmarks/train_roofline.py, PERF.md round 4), and its
output depends only on the audio, so the same argument that justified the
FORCE frozen-tower cache (train/frozen_cache.py, 5.3×) applies one level
down.  SpecAugment, feature projection, dropout — everything trainable or
stochastic — applies AFTER the FE, so caching is numerically sound: at
equal pad widths the step is bit-identical to the direct one, and across
widths it carries exactly the audio-bucketing tolerance every batched
path already has (the TV head's FIR tail mixes the last taps//2 frames
with pad rows — same as the reference's own Conv1d 'same' smoothing over
batch padding; pinned in tests/test_fe_cache.py).

:class:`FECachedLoader` consumes a ``collate_tv`` / ``collate_ctc`` batch
loader ONCE at construction, runs a jitted FE-only forward per utterance
(sharded over the mesh when given), and then serves shuffled,
frame-bucketed batches carrying ``fe_features`` instead of ``audio`` —
feeding ``APTAI.train_from_features`` / ``W2V2PR.train_from_features``.

Invalidation contract: the cache is valid only while (a) the FE is frozen
and (b) the audio is constant per utterance — i.e. NOT under the PR
trainer's random 1 s cropping (the trainers gate on both conditions).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import numpy as np

from aptai_tpu import CTC_LABEL_PAD_ID, PHONEME_FRAME_PAD_ID, TV_PAD_VALUE
from aptai_tpu.data.batching import (FRAME_BUCKET, LABEL_BUCKET,
                                     BucketedLoader, _pad_to, _round_up)
from aptai_tpu.train.frozen_cache import (_CachedItems, place_params,
                                          sharded_encode)


@functools.lru_cache(maxsize=None)
def _fe_fn(cfg):
    """Jitted FeatureExtractor-only forward for the one-time cache pass
    (applied with the encoder's ``feature_extractor`` param subtree)."""
    from aptai_tpu.models.wav2vec2 import FeatureExtractor

    fe = FeatureExtractor(cfg)

    def fn(p, a, l):
        del l  # signature shared with sharded_encode
        return {"fe": fe.apply({"params": p}, a)}

    return jax.jit(fn)


def _cache_items(loader, cfg, fe_params, mesh) -> List[Dict]:
    """One pass over ``loader``: FE-encode every utterance, trim to its
    frame length, keep the label fields the train step needs."""
    fe_params, mesh = place_params(fe_params, mesh)
    fn = _fe_fn(cfg)
    items: List[Dict] = []
    for batch in loader:
        enc = sharded_encode(fn, fe_params, mesh, batch["audio"],
                             batch["audio_lengths"])
        feats = np.asarray(enc["fe"], np.float32)
        a_len = np.asarray(batch["audio_lengths"])
        f_len = np.asarray(cfg.feat_extract_output_lengths(a_len))
        mask = np.asarray(batch.get(
            "batch_pad_mask", np.ones(len(feats), bool)))
        for b in range(len(feats)):
            if not mask[b]:
                continue  # repeat-padded partial-batch row
            t = int(f_len[b])
            item = {
                "fe_features": feats[b, :t],
                "audio_length": int(a_len[b]),
                "frame_length": t,
            }
            if "tv_targets" in batch:      # collate_tv (APTAI)
                item["tv_targets"] = np.asarray(
                    batch["tv_targets"][b, :t], np.float32)
                item["phn_frames"] = np.asarray(
                    batch["phn_frames"][b, :t], np.int32)
            if "phoneme_labels" in batch:  # collate_ctc / collate_tv
                lab = np.asarray(batch["phoneme_labels"][b])
                item["phoneme_label"] = lab[lab != CTC_LABEL_PAD_ID]
            items.append(item)
    return items


def collate_fe(items, bucket: bool = True) -> Dict[str, np.ndarray]:
    """Batch cached FE items: frame axis pads to FRAME_BUCKET multiples
    (zero-padded FE rows are inert — the encoder zeroes padded frames
    before the pos-conv either way), labels keep their usual sentinels."""
    f_w = max(x["frame_length"] for x in items)
    if bucket:
        f_w = _round_up(f_w, FRAME_BUCKET)
    out = {
        "fe_features": np.stack(
            [_pad_to(x["fe_features"], f_w, 0.0) for x in items]),
        "audio_lengths": np.asarray(
            [x["audio_length"] for x in items], np.int32),
    }
    if "tv_targets" in items[0]:
        out["tv_targets"] = np.stack(
            [_pad_to(x["tv_targets"], f_w, TV_PAD_VALUE) for x in items])
        out["phn_frames"] = np.stack(
            [_pad_to(x["phn_frames"], f_w, PHONEME_FRAME_PAD_ID)
             for x in items])
    if "phoneme_label" in items[0]:
        l_w = _round_up(max(len(x["phoneme_label"]) for x in items),
                        LABEL_BUCKET)
        out["phoneme_labels"] = np.stack(
            [_pad_to(np.asarray(x["phoneme_label"], np.int32), l_w,
                     CTC_LABEL_PAD_ID) for x in items])
    return out


class FECachedLoader(BucketedLoader):
    """Shuffled, frame-bucketed batches over cached FE features."""

    def __init__(self, loader, cfg, fe_params, mesh=None, shuffle=True,
                 seed: int = 0):
        super().__init__(
            _CachedItems(_cache_items(loader, cfg, fe_params, mesh)),
            batch_size=loader.batch_size, collate_fn=collate_fe,
            shuffle=shuffle, seed=seed,
        )

    def _item_width(self, item) -> int:
        return _round_up(item["frame_length"], FRAME_BUCKET)

    @property
    def cache_bytes(self) -> int:
        return sum(x["fe_features"].nbytes for x in self.dataset.items)
