"""Long-audio streaming inference: chunked encoding with overlap stitching.

New first-class scope (BASELINE.json config #5; the reference has no
long-context path at all — SURVEY.md §5.7).  Strategy:

  * slice arbitrarily long audio into fixed ``chunk_seconds`` windows with
    ``overlap_seconds`` of bilateral context (one compiled program per
    chunk shape — no recompile storms);
  * run the APTAI forward per chunk (the transformer sees the full chunk,
    so every retained frame has ≥ overlap/2 seconds of acoustic context);
  * stitch frame outputs at chunk centers (drop half the overlap on each
    side), preserving the 20 ms frame grid;
  * frame-level phoneme alignment comes out of the same pass (argmax on
    device), so hour-long recordings decode without ever materializing
    full-length attention.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import numpy as np

from aptai_tpu import FRAME_RATE_HZ, SAMPLE_RATE, TV_ORDER


class StreamingAPTAI:
    def __init__(self, model, params, chunk_seconds: float = 20.0,
                 overlap_seconds: float = 2.0, mesh=None,
                 chunk_batch: int = 1):
        """``mesh`` + ``chunk_batch`` > 1 enable *sequence parallelism for a
        single long recording*: consecutive chunks are batched and the batch
        axis shards over the mesh's data axis, so one hour-long file spreads
        across chips (the chunks are independent given the overlap context,
        so no cross-chip attention is needed)."""
        if overlap_seconds >= chunk_seconds:
            raise ValueError("overlap must be smaller than the chunk")
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from aptai_tpu.parallel import shard_tree

            params = shard_tree(mesh, params)
        self.params = params
        self.chunk_batch = max(int(chunk_batch), 1)
        self.chunk = int(chunk_seconds * SAMPLE_RATE)
        self.overlap = int(overlap_seconds * SAMPLE_RATE)
        frame_hop = 1
        for s in model.cfg.conv_stride:
            frame_hop *= s
        # hop must be a frame-hop multiple for exact frame tiling
        self.hop = ((self.chunk - self.overlap) // frame_hop) * frame_hop
        self._fwd = jax.jit(
            lambda p, a, l: model.apply({"params": p}, a, l, method="predict")
        )

    def _run_chunks(self, padded: np.ndarray, lens: np.ndarray):
        """Forward a (N, chunk) stack, data-sharded when a mesh is set."""
        if self.mesh is not None:
            from aptai_tpu.parallel import shard_batch

            padded, lens = shard_batch(self.mesh, (padded, lens))
            with self.mesh:
                return self._fwd(self.params, padded, lens)
        return self._fwd(self.params, padded, lens)

    def _frames_for(self, n_samples: int) -> int:
        return int(self.model.cfg.feat_extract_output_lengths(
            np.asarray(n_samples)))

    def predict(self, wav: np.ndarray) -> Dict:
        """Stream one long waveform; returns stitched per-frame outputs
        (same keys as APTAI ``predict``, but unbounded duration)."""
        wav = np.asarray(wav, np.float32)
        if len(wav) <= self.chunk:
            chunks = [wav]
            starts = [0]
        else:
            starts = list(range(0, len(wav) - self.overlap, self.hop))
            chunks = [wav[s : s + self.chunk] for s in starts]

        tvs_parts: List[np.ndarray] = []
        phn_parts: List[np.ndarray] = []
        prob_parts: List[np.ndarray] = []

        # exact frame tiling: the conv stack is shift-invariant per
        # frame_hop_samples (= Π strides), and hop is a multiple of it, so
        # chunk-local frame t maps to absolute frame t + start/frame_hop
        frame_hop = 1
        for s_ in self.model.cfg.conv_stride:
            frame_hop *= s_
        half_ov_frames = self._frames_for(self.overlap) // 2
        prev_end_abs = 0

        # stack chunks and forward them chunk_batch at a time (the batch axis
        # is the sequence-parallel axis when a mesh is configured)
        n_chunks = len(chunks)
        padded = np.zeros((n_chunks, self.chunk), np.float32)
        lens = np.zeros((n_chunks,), np.int32)
        for i, chunk in enumerate(chunks):
            padded[i, : len(chunk)] = chunk
            lens[i] = len(chunk)

        outs = []
        g = self.chunk_batch
        for i0 in range(0, n_chunks, g):
            grp = slice(i0, min(i0 + g, n_chunks))
            p, l = padded[grp], lens[grp]
            if len(l) < g and g > 1:  # keep the compiled shape static
                reps = g - len(l)
                p = np.concatenate([p, np.repeat(p[-1:], reps, axis=0)])
                l = np.concatenate([l, np.repeat(l[-1:], reps)])
            out = self._run_chunks(p, l)
            for j in range(grp.stop - grp.start):
                outs.append(jax.tree.map(lambda a: np.asarray(a)[j], out))

        for i, (s, out) in enumerate(zip(starts, outs)):
            t = self._frames_for(int(lens[i]))
            tvs = out["tvs_pred"][:t]
            phn = out["phn_fc_pred"][:t]
            probs = out["phn_fc_probs"][:t]

            offset = s // frame_hop
            lo = max(prev_end_abs - offset, 0)
            hi = t if i == n_chunks - 1 else t - half_ov_frames
            prev_end_abs = offset + hi
            tvs_parts.append(tvs[lo:hi])
            phn_parts.append(phn[lo:hi])
            prob_parts.append(probs[lo:hi])

        tvs_all = np.concatenate(tvs_parts, axis=0)
        return {
            "tvs_pred": {k: tvs_all[:, i] for i, k in enumerate(TV_ORDER)},
            "phn_fc_pred": np.concatenate(phn_parts, axis=0),
            "phn_fc_probs": np.concatenate(prob_parts, axis=0),
            "frame_rate_hz": FRAME_RATE_HZ,
        }
