"""Shared validation / test evaluation passes.

Metric aggregation mirrors the reference exactly:
  * PR validation: corpus PER = Σedit/Σlen + mean loss
    (reference train/train_phoneme_recognizer.py:507-562);
  * TV validation: 10-metric dict (train/train_aptai.py:533-652);
  * TV test: per-TV RMSE/PCC + FER/PER/overlap/boundary per rate
    (train/train_aptai.py:655-838).

Two deliberate deviations from reference quirks (SURVEY.md §2.5):
  * the metric-side TV ground-truth stack uses TMCD in the TMCD slot (the
    reference duplicates TTCD there — train_aptai.py:559,704);
  * boundary P/R/F1/R-value is computed on *boundary times* derived from
    frame runs (×20 ms), not on raw frame-id sequences as the reference
    accidentally does (train_aptai.py:607-609).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import numpy as np

from aptai_tpu.decode.beam import beam_search
from aptai_tpu.decode.native import beam_search_native, edit_distance
from aptai_tpu.train.metrics import (
    PERAccumulator,
    boundaries_from_frames,
    boundary_stats,
    evaluate_overlap,
    frame_ids_to_sequence,
    tvs_pcc,
    tvs_rmse,
)


def decode_best(log_probs: np.ndarray, blank: int = 0, beam_size: int = 10):
    """Beam decode one utterance — C++ if available, Python otherwise."""
    nat = beam_search_native(log_probs, blank=blank, beam_size=beam_size)
    if nat is not None:
        return nat[0]
    return list(beam_search(log_probs, blank=blank, beam_size=beam_size)[0].tokens)


def decode_greedy(log_probs: np.ndarray, blank: int = 0):
    """Host-side greedy collapse (argmax → dedupe → de-blank) — the cheap
    per-epoch validation decode (beam search stays the final-test decode,
    preserving the reference's reported-PER protocol)."""
    ids = np.argmax(log_probs, axis=-1)
    keep = np.ones(len(ids), bool)
    keep[1:] = ids[1:] != ids[:-1]
    collapsed = ids[keep]
    return collapsed[collapsed != blank].tolist()


_BEAM_DEVICE_JIT = None


def _device_beam_batch(log_probs, frame_lengths):
    """Jitted batched beam decode for validation: the whole batch's search
    runs on device in one program instead of utterance-serial on the host
    (identical sequences — decode/device.py; tests/test_device_beam.py).
    One shared jit wrapper so each batch shape compiles once."""
    global _BEAM_DEVICE_JIT
    if _BEAM_DEVICE_JIT is None:
        import jax

        from aptai_tpu.decode.device import beam_decode_device

        _BEAM_DEVICE_JIT = jax.jit(beam_decode_device)
    seqs, lens, _ = _BEAM_DEVICE_JIT(log_probs, frame_lengths)
    return np.asarray(seqs), np.asarray(lens)


def validate_pr(
    forward_fn: Callable,
    batches: Iterable[Dict[str, np.ndarray]],
    max_batches: int | None = None,
    decode: str = "beam",
) -> Dict[str, float]:
    """PR validation: mean CTC loss + corpus PER via beam decode — host
    (``"beam"``) or batched on-device (``"beam_device"``) — or host greedy.

    ``forward_fn(batch) -> {loss, log_probs, frame_lengths}`` (jitted apply).
    """
    per = PERAccumulator()
    losses = []
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        out = forward_fn(batch)
        losses.append(float(out["loss"]))
        if decode == "beam_device":
            # decoded ids only — fetching the full (B, T, V) log-probs is
            # exactly the host transfer the device beam exists to avoid
            seqs, seq_lens = _device_beam_batch(out["log_probs"],
                                                out["frame_lengths"])
            n_rows = len(seqs)
        else:
            log_probs = np.asarray(out["log_probs"])
            frame_lengths = np.asarray(out["frame_lengths"])
            n_rows = len(log_probs)
        mask = batch.get("batch_pad_mask", np.ones(n_rows, bool))
        for b in range(n_rows):
            if not mask[b]:
                continue
            labels = batch["phoneme_labels"][b]
            gt = labels[labels >= 0].tolist()
            if decode == "beam_device":
                pred = seqs[b, : seq_lens[b]].tolist()
            else:
                lp = log_probs[b, : frame_lengths[b]]
                pred = (decode_greedy(lp) if decode == "greedy"
                        else decode_best(lp))
            per.update(gt, pred)
    return {
        "mean_val_per": per.per,
        "mean_val_loss": float(np.mean(losses)) if losses else float("nan"),
    }


def _tv_frame_metrics(gt_frames: np.ndarray, pred_frames: np.ndarray):
    """FER counters, overlap, boundary stats, FC-PER pieces for one item."""
    corr = int((gt_frames == pred_frames).sum())
    total = len(gt_frames)
    overlap = evaluate_overlap([gt_frames], [pred_frames])
    y_b = boundaries_from_frames(gt_frames)
    yhat_b = boundaries_from_frames(pred_frames)
    if len(y_b) and len(yhat_b):
        p, r, f1, rval = boundary_stats(y_b, yhat_b)
    else:
        p = r = f1 = rval = 0.0
    y_seq = frame_ids_to_sequence(gt_frames.tolist())
    yhat_seq = frame_ids_to_sequence(pred_frames.tolist())
    fc_edit = edit_distance(y_seq, yhat_seq)
    return corr, total, overlap, (p, r, f1, rval), fc_edit, len(y_seq)


def validate_tv(
    forward_fn: Callable,
    batches: Iterable[Dict[str, np.ndarray]],
    max_batches: int | None = None,
) -> Dict[str, float]:
    """APTAI/FORCE validation — the 10-metric dict of
    reference train/train_aptai.py:641-652.

    ``forward_fn(batch) -> {loss, tvs_pred, phn_fc_pred or
    pred_frame_phns, frame_lengths}``.
    """
    losses, rmses, pccs, overlaps = [], [], [], []
    ps, rs, f1s, rvals = [], [], [], []
    fc_edits, fc_lens = [], []
    corr_frames = total_frames = 0

    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        out = forward_fn(batch)
        losses.append(float(out["loss"]))
        tvs_pred = np.asarray(out["tvs_pred"])
        pred_key = "phn_fc_pred" if "phn_fc_pred" in out else "pred_frame_phns"
        preds = np.asarray(out[pred_key])
        mask = batch.get("batch_pad_mask", np.ones(len(tvs_pred), bool))
        for b in range(len(tvs_pred)):
            if not mask[b]:
                continue
            n = int(batch["frame_lengths"][b])
            gt_tv = np.asarray(batch["tv_targets"][b][:n], np.float64)
            pd_tv = np.asarray(tvs_pred[b][:n], np.float64)
            valid = gt_tv[:, 0] != -100.0
            gt_tv, pd_tv = gt_tv[valid], pd_tv[valid]
            rmses.append(float(np.mean(list(tvs_rmse(gt_tv, pd_tv).values()))))
            pccs.append(float(np.mean(list(tvs_pcc(gt_tv, pd_tv).values()))))

            gt_f = np.asarray(batch["phn_frames"][b][:n])
            pd_f = np.asarray(preds[b][:n])
            corr, total, overlap, (p, r, f1, rv), fce, fcl = _tv_frame_metrics(
                gt_f, pd_f
            )
            corr_frames += corr
            total_frames += total
            overlaps.append(overlap)
            ps.append(p)
            rs.append(r)
            f1s.append(f1)
            rvals.append(rv)
            fc_edits.append(fce)
            fc_lens.append(fcl)

    return {
        "val_mean_loss": float(np.mean(losses)),
        "val_mean_rmse": float(np.mean(rmses)),
        "val_mean_pcc": float(np.mean(pccs)),
        "val_mean_FER": 1 - corr_frames / max(total_frames, 1),
        "val_mean_PER": float(np.sum(fc_edits) / max(np.sum(fc_lens), 1)),
        "val_mean_F1": float(np.mean(f1s)),
        "val_mean_p": float(np.mean(ps)),
        "val_mean_r": float(np.mean(rs)),
        "val_mean_Rval": float(np.mean(rvals)),
        "val_mean_overlap": float(np.mean(overlaps)),
    }


def test_tv(
    forward_fn: Callable,
    batches: Iterable[Dict[str, np.ndarray]],
    rate: str,
    max_batches: int | None = None,
) -> Dict[str, float]:
    """Per-rate test metrics incl. per-TV breakdown
    (reference train/train_aptai.py:655-838)."""
    from aptai_tpu import TV_ORDER

    rmse_tv = {k: [] for k in TV_ORDER}
    pcc_tv = {k: [] for k in TV_ORDER}
    overlaps, ps, rs, f1s, rvals = [], [], [], [], []
    fc_edits, fc_lens = [], []
    corr_frames = total_frames = 0

    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        out = forward_fn(batch)
        tvs_pred = np.asarray(out["tvs_pred"])
        pred_key = "phn_fc_pred" if "phn_fc_pred" in out else "pred_frame_phns"
        preds = np.asarray(out[pred_key])
        mask = batch.get("batch_pad_mask", np.ones(len(tvs_pred), bool))
        for b in range(len(tvs_pred)):
            if not mask[b]:
                continue
            n = int(batch["frame_lengths"][b])
            gt_tv = np.asarray(batch["tv_targets"][b][:n], np.float64)
            pd_tv = np.asarray(tvs_pred[b][:n], np.float64)
            valid = gt_tv[:, 0] != -100.0
            gt_tv, pd_tv = gt_tv[valid], pd_tv[valid]
            for k, v in tvs_rmse(gt_tv, pd_tv).items():
                rmse_tv[k].append(v)
            for k, v in tvs_pcc(gt_tv, pd_tv).items():
                pcc_tv[k].append(v)

            gt_f = np.asarray(batch["phn_frames"][b][:n])
            pd_f = np.asarray(preds[b][:n])
            corr, total, overlap, (p, r, f1, rv), fce, fcl = _tv_frame_metrics(
                gt_f, pd_f
            )
            corr_frames += corr
            total_frames += total
            overlaps.append(overlap)
            ps.append(p)
            rs.append(r)
            f1s.append(f1)
            rvals.append(rv)
            fc_edits.append(fce)
            fc_lens.append(fcl)

    mean_rmse = {k: float(np.mean(v)) for k, v in rmse_tv.items()}
    mean_pcc = {k: float(np.mean(v)) for k, v in pcc_tv.items()}
    out = {
        f"test_{rate}_mean_rmse": float(np.mean(list(mean_rmse.values()))),
        f"test_{rate}_mean_pcc": float(np.mean(list(mean_pcc.values()))),
        f"test_{rate}_mean_FER": 1 - corr_frames / max(total_frames, 1),
        f"test_{rate}_mean_PER": float(
            np.sum(fc_edits) / max(np.sum(fc_lens), 1)),
        f"test_{rate}_mean_overlap": float(np.mean(overlaps)),
        f"test_{rate}_mean_F1": float(np.mean(f1s)),
        f"test_{rate}_mean_p": float(np.mean(ps)),
        f"test_{rate}_mean_r": float(np.mean(rs)),
        f"test_{rate}_mean_Rval": float(np.mean(rvals)),
    }
    for k in mean_pcc:
        out[f"test_{rate}_mean_{k}_pcc"] = mean_pcc[k]
    for k in mean_rmse:
        out[f"test_{rate}_mean_{k}_rmse"] = mean_rmse[k]
    return out
