"""Micro-batching inference server core.

Production-serving scaffold the reference never had (its inference is eager
batch-1, SURVEY.md §3.4): requests are queued on the host, coalesced into
bucketed static-shape batches (amortizing jit dispatch + maximizing MXU
occupancy), executed on device, and fanned back out per request.

The core is synchronous-friendly (``serve_pending``) and also runs a
background thread (``start``/``submit``/``Future``) for request/response
style use.  Transport (HTTP/gRPC) is intentionally out of scope — this is
the batching engine those layers sit on.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, Dict, List, Sequence

import numpy as np


class MicroBatcher:
    def __init__(
        self,
        predict_batch: Callable[[Sequence[np.ndarray]], Dict],
        max_batch_size: int = 32,
        max_wait_ms: float = 10.0,
        pad_to_max: bool = True,
    ):
        """Args:
          predict_batch: batched model entry point (e.g.
            ``APTAIPredictor.predict_batch``) returning a dict of
            ``(B, ...)`` arrays plus ``frame_lengths``.
          pad_to_max: pad every drained micro-batch to ``max_batch_size``
            with silence rows so the device sees ONE static serving shape —
            a fresh jit compile per distinct batch size costs minutes of
            full-model compilation in the request path (round-2 lesson:
            43 s p50 latency).  ``warmup()`` pre-compiles that shape.
        """
        self.predict_batch = predict_batch
        self.max_batch_size = max_batch_size
        self.max_wait_ms = max_wait_ms
        self.pad_to_max = pad_to_max
        self._queue: "queue.Queue" = queue.Queue()
        self._thread = None
        self._stop = threading.Event()

    # -- synchronous core ---------------------------------------------------

    def warmup(self, seconds: float = 2.0, rate: int = 16_000):
        """Pre-compile the serving shape(s) before taking traffic."""
        wav = np.zeros(int(seconds * rate), np.float32)
        self.run_batch([wav] * (self.max_batch_size if self.pad_to_max
                                else 1))
        return self

    def run_batch(self, wavs: Sequence[np.ndarray]) -> List[Dict]:
        """Run one coalesced batch and split results per item.

        Relies on the ``predict_batch`` contract (``infer/api.py``): every
        output is batch-leading with leading dim == number of submitted
        wavs — no shape heuristics.  Frame-axis arrays (second dim ≥ the
        item's frame count) are cut to the item's true frame length."""
        fill = list(wavs)
        if self.pad_to_max and len(fill) < self.max_batch_size:
            pad = np.zeros_like(np.asarray(fill[0]))
            fill.extend([pad] * (self.max_batch_size - len(fill)))
        out = self.predict_batch(fill)
        frame_lengths = np.asarray(out["frame_lengths"])
        results = []
        for b in range(len(wavs)):
            n = int(frame_lengths[b])
            item = {}
            for k, v in out.items():
                arr = np.asarray(v)
                if arr.ndim >= 2:
                    item[k] = arr[b, :n] if arr.shape[1] >= n else arr[b]
                else:
                    item[k] = arr[b]
            results.append(item)
        return results

    # -- background request/response -----------------------------------------

    def submit(self, wav: np.ndarray) -> "Future":
        fut: Future = Future()
        self._queue.put((np.asarray(wav, np.float32), fut))
        return fut

    def serve_pending(self) -> int:
        """Drain up to one micro-batch from the queue; returns #served."""
        items = []
        try:
            items.append(self._queue.get(timeout=self.max_wait_ms / 1000))
        except queue.Empty:
            return 0
        while len(items) < self.max_batch_size:
            try:
                items.append(self._queue.get_nowait())
            except queue.Empty:
                break
        wavs = [w for w, _ in items]
        try:
            results = self.run_batch(wavs)
            for (_, fut), res in zip(items, results):
                fut.set_result(res)
        except Exception as e:  # pragma: no cover
            for _, fut in items:
                fut.set_exception(e)
        return len(items)

    def _loop(self):
        while not self._stop.is_set():
            self.serve_pending()

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
