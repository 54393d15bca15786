"""Attention: XLA path vs NumPy, flash kernel (interpret mode) vs XLA path,
and gradient flow through the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp

from aptai_tpu.ops.attention import (
    _xla_attention,
    multi_head_attention,
    flash_attention,
)


def _numpy_attention(q, k, v, lengths):
    b, t, h, d = q.shape
    out = np.zeros_like(q)
    for bi in range(b):
        L = int(lengths[bi]) if lengths is not None else t
        for hi in range(h):
            s = (q[bi, :, hi] @ k[bi, :L, hi].T) / np.sqrt(d)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[bi, :, hi] = p @ v[bi, :L, hi]
    return out


def test_xla_attention_matches_numpy(rng):
    B, T, H, D = 2, 10, 3, 8
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    v = rng.standard_normal((B, T, H, D)).astype(np.float32)
    lengths = np.array([10, 6], np.int32)
    got = np.asarray(_xla_attention(*map(jnp.asarray, (q, k, v)),
                                    jnp.asarray(lengths)))
    want = _numpy_attention(q, k, v, lengths)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mha_custom_vjp_grads_flow(rng):
    B, T, H, D = 1, 6, 2, 4
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([5], np.int32))

    def f(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, lengths) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()

    # grads must match plain XLA attention's grads
    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, lengths) ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gi, gr in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_flash_attention_interpret_matches_xla(rng, monkeypatch):
    # Run the Pallas kernel in interpreter mode on CPU.
    import aptai_tpu.ops.attention as att
    import functools
    from jax.experimental import pallas as pl

    orig_pallas_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call",
        functools.partial(orig_pallas_call, interpret=True),
    )

    B, T, H, D = 2, 200, 2, 64
    q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
    lengths = jnp.asarray(np.array([200, 130], np.int32))

    got = np.asarray(att.flash_attention(q, k, v, lengths))
    want = np.asarray(_xla_attention(q, k, v, lengths))
    # padded key rows are masked; padded query rows are unspecified -> compare
    # only valid query region per batch item
    for b, L in enumerate([200, 130]):
        np.testing.assert_allclose(got[b, :L], want[b, :L], rtol=1e-3, atol=1e-4)
