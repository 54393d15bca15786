"""Device vs host CTC beam decode throughput.

Compares, at the flagship inference shape (batch 32 x 10 s -> T=499 frames,
V=46), the three decode strategies on real log-probs-shaped inputs:

  * host beam  — decode/beam.py via the C++ native search (the reference's
    mechanism: fetch (B, T, V) log-probs, search utterance-serially on CPU);
  * device beam — decode/device.py: the same prefix search as one jitted
    scan, vmapped over the batch, fetching only the (B, 60) sequences;
  * device greedy — ops/ctc.py greedy_decode (the lower bound).

Run on the chip: `python benchmarks/beam_decode_bench.py`.
Methodology matches bench.py (chained scalar dependency, one fetch).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.decode.beam import beam_decode_padded
    from aptai_tpu.decode.device import beam_decode_device
    from aptai_tpu.ops.ctc import greedy_decode

    b, t, v, max_len = 32, 499, 46, 60
    rng = np.random.default_rng(0)
    # CTC-like posteriors: blank-dominated with 20-45 emission bursts per
    # utterance (decoded lengths stay under the 60-token cap, where the
    # device search is exact — see decode/device.py capacity semantics)
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logits[..., 0] += 6.0
    for i in range(b):
        n_emit = rng.integers(20, 45)
        frames = np.sort(rng.choice(t, n_emit, replace=False))
        toks = rng.integers(1, v, n_emit)
        logits[i, frames, toks] += 10.0
    lp_host = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lp = jnp.asarray(lp_host)
    fl = jnp.full((b,), t, jnp.int32)

    # --- host beam (C++): fetch + serial search
    t0 = time.perf_counter()
    seq_h, len_h, _ = beam_decode_padded(lp_host, np.full(b, t), max_len)
    host_s = time.perf_counter() - t0

    # --- device beam
    @jax.jit
    def dev_beam(x, l, chain):
        s, ln, tr = beam_decode_device(x + 0.0 * chain, l,
                                       max_output_length=max_len)
        return s, ln, jnp.sum(s) + jnp.sum(ln)

    s, ln, c = dev_beam(lp, fl, jnp.float32(0))  # compile
    _ = np.asarray(c)
    iters = 5
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        s, ln, c = dev_beam(lp, fl, 0.0 * c.astype(jnp.float32))
    seq_d, len_d = np.asarray(s), np.asarray(ln)
    _ = float(np.asarray(c))
    dev_s = (time.perf_counter() - t0) / iters

    # --- device greedy
    @jax.jit
    def dev_greedy(x, l, chain):
        s, ln, tr = greedy_decode(x + 0.0 * chain, l, blank=0,
                                  max_output_length=max_len,
                                  return_truncated=True)
        return s, ln, jnp.sum(s) + jnp.sum(ln)

    s, ln, c = dev_greedy(lp, fl, jnp.float32(0))
    _ = np.asarray(c)
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(iters):
        s, ln, c = dev_greedy(lp, fl, 0.0 * c.astype(jnp.float32))
    _ = float(np.asarray(c))
    greedy_s = (time.perf_counter() - t0) / iters

    agree = all(
        seq_h[i, : len_h[i]].tolist() == seq_d[i, : len_d[i]].tolist()
        for i in range(b)
    )
    audio_s = b * 10.0
    print(f"host C++ beam : {host_s * 1e3:8.1f} ms/batch "
          f"({audio_s / host_s:8.1f} audio-s/s)")
    print(f"device beam   : {dev_s * 1e3:8.1f} ms/batch "
          f"({audio_s / dev_s:8.1f} audio-s/s)  sequences agree: {agree}")
    print(f"device greedy : {greedy_s * 1e3:8.1f} ms/batch "
          f"({audio_s / greedy_s:8.1f} audio-s/s)")


if __name__ == "__main__":
    main()
