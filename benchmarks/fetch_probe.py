"""Does ``copy_to_host_async`` pipeline multi-field fetches on this link?

``infer.api.fetch_outputs`` starts every device→host transfer before the
first blocking ``np.asarray`` so an N-field output dict costs ~1 round trip
instead of N (at ~30 ms RTT on the tunnel, a 4-field dict is the difference
between ~35 ms and ~130 ms of pure fetch latency).  This probe measures
both orders on the real link with serving-sized buffers.

    python benchmarks/fetch_probe.py [--trials 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--fields", type=int, default=4)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # serving-sized per-field payloads: (16, 99, 9) f32 TVs ≈ 57 KB each
    base = [jax.device_put(rng.standard_normal(
        (16, 99, 9)).astype(np.float32)) for _ in range(args.fields)]

    @jax.jit
    def bump(x, s):
        return x + s

    def fetch(arrs, async_first: bool) -> float:
        t0 = time.perf_counter()
        if async_first:
            for a in arrs:
                a.copy_to_host_async()
        for a in arrs:
            np.asarray(a)
        return time.perf_counter() - t0

    # warm the compile + transfer path
    fetch([bump(b, jnp.float32(0.5)) for b in base], True)
    fetch([bump(b, jnp.float32(1.5)) for b in base], False)

    results = {}
    for mode, async_first in (("serial_np_asarray", False),
                              ("async_then_asarray", True)):
        times = []
        for t in range(args.trials):
            # fresh device values each trial so no host copy is cached
            arrs = [bump(b, jnp.float32(t + (2 if async_first else 100)))
                    for b in base]
            times.append(fetch(arrs, async_first))
        results[mode + "_ms"] = round(1e3 * float(np.median(times)), 2)
    results["fields"] = args.fields
    results["speedup"] = round(
        results["serial_np_asarray_ms"] / results["async_then_asarray_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
