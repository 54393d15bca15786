"""Profiling / tracing hooks — first-class observability the reference lacks
entirely (SURVEY.md §5.1: tqdm bars only).

* :class:`StepTimer` — per-step wall-clock statistics with warmup skip,
  suitable for logging steps/sec and audio-sec/sec as training metrics.
* :func:`trace_profile` — context manager around ``jax.profiler.trace``
  writing a TensorBoard-loadable trace (XLA op breakdown) when the backend
  supports it; degrades to a no-op on backends without profiler support
  (e.g. the axon tunnel).
"""

from __future__ import annotations

import contextlib
import time
from typing import List


class StepTimer:
    def __init__(self, warmup_steps: int = 1):
        self.warmup = warmup_steps
        self.times: List[float] = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]

    def summary(self, units_per_step: float = 1.0) -> dict:
        return {
            "steps_timed": len(self.times),
            "mean_step_seconds": self.mean,
            "p50_step_seconds": self.p50,
            "throughput_per_second": (units_per_step / self.mean
                                      if self.times else float("nan")),
        }


@contextlib.contextmanager
def trace_profile(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception as e:  # backend without profiler support
        print(f"profiling unavailable ({e}); continuing without trace")
        yield
