"""Per-piece timing of the FORCE head train step (the post-cache hot loop).

With the frozen-encoding cache the FORCE step is the ~0.5M-param head:
cross-attention + BiLSTM + FIR + ForwardSum.  Its cost is dominated not by
FLOPs but by *sequential scan latency* (lax.scan over ~T frames for the
LSTM directions and the CTC alpha recursion, each differentiated into a
second scan).  This isolates the pieces so scan optimizations (direction
fusion, unroll) can be measured honestly.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_timer(fn, args, iters, label):
    import jax.numpy as jnp

    s = jnp.float32(0.0)
    for _ in range(2):
        s = fn(s, *args)
    _ = float(s)
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    for _ in range(iters):
        s = fn(s, *args)
    _ = float(s)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {ms:.2f} ms")
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--unroll", type=int, default=0,
                   help="override SCAN_UNROLL/ALPHA_SCAN_UNROLL (0 = ship)")
    args = p.parse_args()

    if args.unroll:
        import aptai_tpu.ops.lstm as _lstm
        import aptai_tpu.ops.ctc as _ctc

        _lstm.SCAN_UNROLL = args.unroll
        _ctc.ALPHA_SCAN_UNROLL = args.unroll
        print(f"unroll override: {args.unroll}")

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.ops.forward_sum import forward_sum_loss
    from aptai_tpu.ops.lstm import LSTMParams, bilstm

    b, t = args.batch, args.frames
    h = 128  # att_hidden_dim (reference force_aptai.py:33)
    n = 60   # max phoneme sequence
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, 2 * h)).astype(np.float32))
    lengths = jnp.asarray(np.full(b, t, np.int32))
    att = jnp.asarray(rng.standard_normal((b, t, n)).astype(np.float32))
    text_lens = jnp.asarray(np.full(b, 40, np.int32))

    def lp(i, o):
        return LSTMParams(
            w_ih=jnp.asarray(rng.standard_normal((4 * o, i)) * 0.05,
                             jnp.float32),
            w_hh=jnp.asarray(rng.standard_normal((4 * o, o)) * 0.05,
                             jnp.float32),
            b_ih=jnp.zeros((4 * o,), jnp.float32),
            b_hh=jnp.zeros((4 * o,), jnp.float32),
        )

    fwd_p, bwd_p = lp(2 * h, 2 * h), lp(2 * h, 2 * h)

    # BiLSTM forward only
    @jax.jit
    def bi_fwd(c, x, l):
        out, _ = bilstm(x + 0.0 * c, l, fwd_p, bwd_p)
        return jnp.sum(out)

    # BiLSTM forward + backward (grad wrt inputs AND weights, as training)
    @jax.jit
    def bi_grad(c, x, l):
        def loss(x, fp, bp):
            out, _ = bilstm(x, l, fp, bp)
            return jnp.sum(out * out)

        g = jax.grad(loss, argnums=(0, 1, 2))(x + 0.0 * c, fwd_p, bwd_p)
        return sum(jnp.sum(t) for t in jax.tree.leaves(g))

    # ForwardSum forward + backward
    @jax.jit
    def fs_grad(c, att, tl, ml):
        def loss(a):
            return forward_sum_loss(a, tl, ml)

        v, g = jax.value_and_grad(loss)(att + 0.0 * c)
        return v + jnp.sum(g)

    chain_timer(bi_fwd, (x, lengths), args.iters, "bilstm fwd")
    chain_timer(bi_grad, (x, lengths), args.iters, "bilstm fwd+bwd")
    chain_timer(fs_grad, (att, text_lens, lengths), args.iters,
                "forward_sum fwd+bwd")


if __name__ == "__main__":
    main()
