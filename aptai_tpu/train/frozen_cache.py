"""Frozen-tower encoding cache for FORCE-APTAI training.

The FORCE model's wav2vec2 tower is *frozen* (reference
models/force_aptai.py:76-78) and runs deterministically (eval mode, no
dropout, no SpecAugment — models/force_aptai.py:encode_frozen), yet the
reference recomputes it — plus a host beam decode — inside EVERY training
step of every epoch (reference train/train_force_aptai.py:403-429 →
force_aptai.py:80-115).  That is ~99.8% of the step FLOPs spent
re-deriving values that cannot change across the run.

This module removes the waste at two scopes:

* :class:`FrozenEncodedLoader` — one fold: run the tower (and the in-step
  CTC decode) exactly ONCE per utterance at construction, cache the
  trimmed per-utterance outputs on the host, then serve shuffled,
  frame-bucketed batches of encodings every epoch — the train step becomes
  the ~0.5M-parameter head alone (``train_from_encoded``).
* :class:`FrozenEncodedCorpus` — one LOSO run: when the tower comes from a
  spliced PR checkpoint it is identical in every fold (fold re-inits only
  reroll the head), so the corpus is encoded ONCE and each fold draws its
  train/val subsets from the shared cache (items keyed by the manifest's
  ``path_wav``).

Numerics are those of the direct step up to audio-bucketing float
tolerance (the same tolerance batched-vs-single inference carries; pinned
in tests/test_frozen_cache.py).  Works for both decode methods: greedy
decodes on device inside the cache pass; beam_host beam-decodes each
utterance once on the host — after which the *training* cost of beam_host
equals greedy's.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aptai_tpu import (CTC_LABEL_PAD_ID, PHONEME_FRAME_PAD_ID,
                       TV_PAD_VALUE)
from aptai_tpu.data.batching import (FRAME_BUCKET, LABEL_BUCKET,
                                     BucketedLoader, _pad_to, _round_up)
from aptai_tpu.ops.ctc import greedy_decode


@functools.lru_cache(maxsize=None)
def _cache_encode_fn(model):
    """Jitted frozen-tower encode (+ the model's on-device decode — greedy
    collapse or device beam search — when it has one) for the one-time
    cache pass; beam_host defers to the host search outside the jit."""
    method = model.decode_method

    def fn(p, a, l):
        enc = model.apply({"params": p}, a, l, method="encode_frozen")
        out = {"frame_embs": enc["frame_embs"],
               "frame_lengths": enc["frame_lengths"],
               # tower per-frame posterior argmax, cached for the optional
               # aux frame-CE distillation (ForceAPTAI.aux_frame_ce_weight)
               "tower_frame_labels": jnp.argmax(
                   enc["ctc_log_probs"], axis=-1).astype(jnp.int32)}
        if method == "beam_host":
            out["ctc_log_probs"] = enc["ctc_log_probs"]
        elif method == "beam_device":
            from aptai_tpu.decode.device import beam_decode_device

            seqs, sl, tr = beam_decode_device(
                enc["ctc_log_probs"], enc["frame_lengths"], blank=0,
                max_output_length=model.max_phn_seq_len,
            )
            out.update(phn_pred_seq=seqs, phn_seq_lengths=sl,
                       phn_seq_truncated=tr)
        else:
            seqs, sl, tr = greedy_decode(
                enc["logits"], enc["frame_lengths"], blank=0,
                max_output_length=model.max_phn_seq_len,
                return_truncated=True,
            )
            out.update(phn_pred_seq=seqs, phn_seq_lengths=sl,
                       phn_seq_truncated=tr)
        return out

    return jax.jit(fn)


def place_params(params, mesh):
    """Place a frozen param tree for the encode pass: sharded by the
    tensor-parallel path rules on a real (>1 device) mesh — the tower
    encode must run sharded like the step itself, not on device 0 — plain
    placement otherwise.  Always FRESH buffers, never aliased with a
    donated train state.  Returns ``(placed params, effective mesh)``."""
    mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
    if mesh is not None:
        from aptai_tpu.parallel import shard_tree

        return shard_tree(mesh, params), mesh
    return jax.device_put(params), None


def sharded_encode(enc_fn, params, mesh, audio, audio_lengths):
    """Run a jitted encode, batch sharded over the data axis when a mesh
    is in effect (shared by the cache pass and BeamDecodedBatches)."""
    if mesh is not None:
        from aptai_tpu.parallel import shard_batch

        with mesh:
            sb = shard_batch(mesh, {"audio": audio,
                                    "audio_lengths": audio_lengths})
            return enc_fn(params, sb["audio"], sb["audio_lengths"])
    return enc_fn(params, audio, audio_lengths)


def _encode_items(loader, model, params, mesh) -> List[Dict]:
    """The one-time cache pass: consume ``loader`` (``collate_tv`` batches),
    run the tower (sharded over ``mesh`` when given) + the in-step decode,
    and return trimmed per-utterance cache items in emission order."""
    params, mesh = place_params(params, mesh)
    enc_fn = _cache_encode_fn(model)
    beam = model.decode_method == "beam_host"
    items: List[Dict] = []
    for batch in loader:
        enc = sharded_encode(enc_fn, params, mesh, batch["audio"],
                             batch["audio_lengths"])
        mask = np.asarray(batch.get(
            "batch_pad_mask", np.ones(len(batch["audio"]), bool)))
        fl = np.asarray(enc["frame_lengths"])
        if beam:
            from aptai_tpu.decode.beam import beam_decode_padded

            n = int(mask.sum())  # real rows lead (BucketedLoader contract)
            seqs, sl, tr = beam_decode_padded(
                enc["ctc_log_probs"][:n], fl[:n],
                model.max_phn_seq_len, out_rows=len(mask),
            )
        else:
            seqs = np.asarray(enc["phn_pred_seq"])
            sl = np.asarray(enc["phn_seq_lengths"])
            tr = np.asarray(enc["phn_seq_truncated"])
        embs = np.asarray(enc["frame_embs"])
        tower_labels = np.asarray(enc["tower_frame_labels"])
        tvs = np.asarray(batch["tv_targets"])
        labels = np.asarray(batch["phoneme_labels"])
        fl_raw = np.asarray(batch.get("frame_lengths", fl))
        phn_frames = np.asarray(batch.get(
            "phn_frames", np.zeros(embs.shape[:2], np.int32)))
        keys = batch.get("utt_keys")
        for b in range(len(mask)):
            if not mask[b]:
                continue  # repeat-padded partial-batch row
            t = int(fl[b])
            lab = labels[b]
            items.append({
                "utt_key": None if keys is None else keys[b],
                "frame_embs": embs[b, :t],
                "frame_length": t,
                "frame_length_raw": int(fl_raw[b]),
                "phn_pred_seq": seqs[b],
                "phn_seq_length": int(sl[b]),
                "phn_seq_truncated": int(tr[b]),
                "tower_frame_labels": tower_labels[b, :t],
                "tv_targets": tvs[b, :t],
                "phn_frames": phn_frames[b, :t],
                "phoneme_label": lab[lab != CTC_LABEL_PAD_ID],
            })
    return items


def collate_encoded(items: Sequence[Dict], bucket: bool = True) -> Dict:
    """Batch cached per-utterance encodings: frame-level arrays pad to
    FRAME_BUCKET multiples (static shapes), sentinels as everywhere else
    (TVs −100.0, CTC labels −100); zero-padded frame embeddings are inert —
    every consumer is length-masked (RNN scan, ForwardSum, TV mask)."""
    f_w = max(int(x["frame_length"]) for x in items)
    if bucket:
        f_w = _round_up(f_w, FRAME_BUCKET)
    l_w = _round_up(max(len(x["phoneme_label"]) for x in items), LABEL_BUCKET)
    return {
        "frame_embs": np.stack(
            [_pad_to(x["frame_embs"], f_w, 0) for x in items]),
        "enc_frame_lengths": np.asarray(
            [x["frame_length"] for x in items], np.int32),
        "phn_pred_seq": np.stack([x["phn_pred_seq"] for x in items]),
        "phn_seq_lengths": np.asarray(
            [x["phn_seq_length"] for x in items], np.int32),
        "phn_seq_truncated": np.asarray(
            [x["phn_seq_truncated"] for x in items], np.int32),
        # frozen-tower posterior argmax (0 = blank; zero-padded tail is
        # excluded by the aux CE's blank mask either way)
        "tower_frame_labels": np.stack(
            [_pad_to(np.asarray(x["tower_frame_labels"], np.int32), f_w, 0)
             for x in items]),
        "tv_targets": np.stack(
            [_pad_to(np.asarray(x["tv_targets"], np.float32), f_w,
                     TV_PAD_VALUE) for x in items]),
        "phoneme_labels": np.stack(
            [_pad_to(np.asarray(x["phoneme_label"], np.int32), l_w,
                     CTC_LABEL_PAD_ID) for x in items]),
        # metric-side keys (validate_tv/ctc_seq_per read these from the
        # batch): ground-truth frame phonemes + the manifest frame count
        "phn_frames": np.stack(
            [_pad_to(np.asarray(x["phn_frames"], np.int32), f_w,
                     PHONEME_FRAME_PAD_ID) for x in items]),
        "frame_lengths": np.asarray(
            [x["frame_length_raw"] for x in items], np.int32),
    }


class _CachedItems:
    def __init__(self, items: List[Dict]):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class EncodedItemsLoader(BucketedLoader):
    """Shuffled, frame-width-bucketed batches over cached encoding items;
    feeds ``ForceAPTAI.train_from_encoded`` directly."""

    def __init__(self, items: List[Dict], batch_size: int,
                 shuffle: bool = True, seed: int = 0):
        super().__init__(
            _CachedItems(items), batch_size=batch_size,
            collate_fn=collate_encoded, shuffle=shuffle, seed=seed,
        )

    def _item_width(self, item) -> int:
        return _round_up(item["frame_length"], FRAME_BUCKET)

    @property
    def cache_bytes(self) -> int:
        return sum(x["frame_embs"].nbytes for x in self.dataset.items)


class FrozenEncodedLoader(EncodedItemsLoader):
    """Per-fold cache: consume ``loader`` (``collate_tv`` batches) ONCE at
    construction to encode + decode every utterance, then iterate as an
    :class:`EncodedItemsLoader`."""

    def __init__(self, loader, model, params, mesh=None, shuffle=True,
                 seed: int = 0):
        super().__init__(
            _encode_items(loader, model, params, mesh),
            batch_size=loader.batch_size, shuffle=shuffle, seed=seed,
        )


class FrozenEncodedCorpus:
    """LOSO-run-wide cache: encode the WHOLE manifest once (valid when the
    frozen tower is fold-invariant, i.e. spliced from a PR checkpoint —
    ``model_cfg['pr_spliced']``), then hand each fold loaders over its
    train/val subsets without re-running the tower per fold."""

    def __init__(self, df, vocab, model, params, batch_size: int,
                 mesh=None):
        from aptai_tpu.data import HPRCDataset, collate_tv

        def collate_with_keys(items):
            out = collate_tv(items)
            out["utt_keys"] = [x["utt_key"] for x in items]
            return out

        loader = BucketedLoader(
            HPRCDataset(df, vocab, rate="both"), batch_size=batch_size,
            collate_fn=collate_with_keys, shuffle=False,
        )
        items = _encode_items(loader, model, params, mesh)
        self.by_key: Dict[str, Dict] = {it["utt_key"]: it for it in items}
        assert len(self.by_key) == len(items), \
            "manifest has duplicate path_wav entries"

    @property
    def cache_bytes(self) -> int:
        return sum(x["frame_embs"].nbytes for x in self.by_key.values())

    def __len__(self):
        return len(self.by_key)

    def loader_for(self, fold_df, batch_size: int, shuffle: bool = True,
                   seed: int = 0) -> EncodedItemsLoader:
        items = [self.by_key[str(p)] for p in fold_df.path_wav]
        return EncodedItemsLoader(items, batch_size, shuffle=shuffle,
                                  seed=seed)
