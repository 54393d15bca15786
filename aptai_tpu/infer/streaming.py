"""Long-audio streaming inference: chunked encoding with overlap stitching.

New first-class scope (BASELINE.json config #5; the reference has no
long-context path at all — SURVEY.md §5.7).  Strategy:

  * slice arbitrarily long audio into fixed ``chunk_seconds`` windows with
    ``overlap_seconds`` of bilateral context (one compiled program per
    chunk shape — no recompile storms);
  * run the model's ``predict`` per chunk (the transformer sees the full
    chunk, so every retained frame has ≥ overlap/2 seconds of acoustic
    context);
  * stitch frame outputs at chunk centers (drop half the overlap on each
    side), preserving the 20 ms frame grid;
  * frame-level phoneme alignment comes out of the same pass (argmax on
    device), so hour-long recordings decode without ever materializing
    full-length attention.

Both model families stream: :class:`StreamingAPTAI` stitches the APTAI
per-frame outputs, :class:`StreamingForceAPTAI` the FORCE-APTAI alignment
outputs (reference inference surfaces models/force_aptai.py:188-322 are
batch-1 and bounded to 60 phonemes; here the 60-phoneme cap applies per
chunk, so arbitrarily long recordings align chunk-locally).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import numpy as np

from aptai_tpu import FRAME_RATE_HZ, SAMPLE_RATE, TV_ORDER


class StreamingPredictor:
    """Chunked streaming over any model exposing a batched ``predict``
    method whose outputs include per-frame arrays named in ``frame_keys``."""

    frame_keys: Tuple[str, ...] = ("tvs_pred",)

    def __init__(self, model, params, chunk_seconds: float = 20.0,
                 overlap_seconds: float = 2.0, mesh=None,
                 chunk_batch: int = 1,
                 frame_keys: Sequence[str] | None = None):
        """``mesh`` + ``chunk_batch`` > 1 enable *sequence parallelism for a
        single long recording*: consecutive chunks are batched and the batch
        axis shards over the mesh's data axis, so one hour-long file spreads
        across chips (the chunks are independent given the overlap context,
        so no cross-chip attention is needed)."""
        if overlap_seconds >= chunk_seconds:
            raise ValueError("overlap must be smaller than the chunk")
        self.model = model
        self.mesh = mesh
        if frame_keys is not None:
            self.frame_keys = tuple(frame_keys)
        if mesh is not None:
            from aptai_tpu.parallel import shard_tree

            params = shard_tree(mesh, params)
        self.params = params
        self.chunk_batch = max(int(chunk_batch), 1)
        self.chunk = int(chunk_seconds * SAMPLE_RATE)
        self.overlap = int(overlap_seconds * SAMPLE_RATE)
        frame_hop = 1
        for s in model_cfg_strides(model):
            frame_hop *= s
        # hop must be a frame-hop multiple for exact frame tiling
        self.hop = ((self.chunk - self.overlap) // frame_hop) * frame_hop
        keep = set(self.frame_keys) | {"frame_lengths"}

        def fwd(p, a, l):
            # only the stitched keys leave the device: XLA dead-code
            # -eliminates the unused heads and the tunnel marshals only
            # what the stitcher consumes
            out = model.apply({"params": p}, a, l, method="predict")
            return {k: v for k, v in out.items() if k in keep}

        self._fwd = jax.jit(fwd)

    def _run_chunks(self, padded: np.ndarray, lens: np.ndarray):
        """Forward a (N, chunk) stack, data-sharded when a mesh is set."""
        if self.mesh is not None:
            from aptai_tpu.parallel import shard_batch

            padded, lens = shard_batch(self.mesh, (padded, lens))
            with self.mesh:
                return self._fwd(self.params, padded, lens)
        return self._fwd(self.params, padded, lens)

    def _frames_for(self, n_samples: int) -> int:
        return int(_model_cfg(self.model).feat_extract_output_lengths(
            np.asarray(n_samples)))

    def _format(self, stitched: Dict[str, np.ndarray]) -> Dict:
        """Post-process the stitched frame arrays into the output dict."""
        out = dict(stitched)
        out["frame_rate_hz"] = FRAME_RATE_HZ
        return out

    def predict(self, wav: np.ndarray) -> Dict:
        """Stream one long waveform; returns stitched per-frame outputs
        (same keys as the model's ``predict``, but unbounded duration)."""
        wav = np.asarray(wav, np.float32)
        if len(wav) <= self.chunk:
            chunks = [wav]
            starts = [0]
        else:
            starts = list(range(0, len(wav) - self.overlap, self.hop))
            chunks = [wav[s : s + self.chunk] for s in starts]

        parts: Dict[str, List[np.ndarray]] = {k: [] for k in self.frame_keys}

        # exact frame tiling: the conv stack is shift-invariant per
        # frame_hop_samples (= Π strides), and hop is a multiple of it, so
        # chunk-local frame t maps to absolute frame t + start/frame_hop
        frame_hop = 1
        for s_ in model_cfg_strides(self.model):
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
                outs.append({k: np.asarray(out[k])[j]
                             for k in self.frame_keys})

        for i, (s, out) in enumerate(zip(starts, outs)):
            t = self._frames_for(int(lens[i]))
            offset = s // frame_hop
            lo = max(prev_end_abs - offset, 0)
            hi = t if i == n_chunks - 1 else t - half_ov_frames
            prev_end_abs = offset + hi
            for k in self.frame_keys:
                parts[k].append(out[k][:t][lo:hi])

        return self._format(
            {k: np.concatenate(v, axis=0) for k, v in parts.items()}
        )


def _model_cfg(model):
    """The backbone config: ``cfg`` on W2V2PR/APTAI, ``pr_cfg`` on
    ForceAPTAI."""
    return getattr(model, "cfg", None) or getattr(model, "pr_cfg")


def model_cfg_strides(model):
    return _model_cfg(model).conv_stride


class StreamingAPTAI(StreamingPredictor):
    """Streaming APTAI: stitched TV trajectories + frame phonemes + probs."""

    frame_keys = ("tvs_pred", "phn_fc_pred", "phn_fc_probs")

    def _format(self, stitched):
        tvs_all = stitched["tvs_pred"]
        return {
            "tvs_pred": {k: tvs_all[:, i] for i, k in enumerate(TV_ORDER)},
            "phn_fc_pred": stitched["phn_fc_pred"],
            "phn_fc_probs": stitched["phn_fc_probs"],
            "frame_rate_hz": FRAME_RATE_HZ,
        }


class StreamingForceAPTAI(StreamingPredictor):
    """Streaming FORCE-APTAI: stitched TV trajectories + frame phonemes from
    the chunk-local forced alignment (the reference's get_faptai_output is
    batch-1 and ≤60 phonemes, models/force_aptai.py:238-322; the cap applies
    per chunk here, so duration is unbounded)."""

    frame_keys = ("tvs_pred", "pred_frame_phns")

    def _format(self, stitched):
        tvs_all = stitched["tvs_pred"]
        return {
            "tvs_pred": {k: tvs_all[:, i] for i, k in enumerate(TV_ORDER)},
            "pred_frame_phns": stitched["pred_frame_phns"],
            "frame_rate_hz": FRAME_RATE_HZ,
        }
