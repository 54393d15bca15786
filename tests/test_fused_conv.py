"""Fused conv+LN+GELU kernel (interpret mode) vs the XLA ConvLayerBlock."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.ops.fused_conv import fused_conv_ln_gelu


def _xla_reference(x, w, b, ls, lb, stride, eps=1e-5):
    out = jax.lax.conv_general_dilated(
        x, w, (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        out = out + b
    mean = out.mean(-1, keepdims=True)
    var = ((out - mean) ** 2).mean(-1, keepdims=True)
    y = (out - mean) * jax.lax.rsqrt(var + eps) * ls + lb
    return jax.nn.gelu(y, approximate=False)


@pytest.mark.parametrize("k,stride,length", [
    (3, 2, 2048 + 5),   # ragged tail tile
    (2, 2, 4096),       # exact tiles
    (3, 2, 700),        # single partial tile
])
def test_fused_conv_matches_xla(rng, k, stride, length):
    B, C = 2, 128
    x = jnp.asarray(rng.standard_normal((B, length, C)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((k, C, C)) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    got = fused_conv_ln_gelu(x, w, b, ls, lb, stride, interpret=True)
    want = _xla_reference(x, w, b, ls, lb, stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_conv_no_bias(rng):
    B, C, L = 1, 128, 1200
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, C, C)) * 0.05).astype(np.float32))
    ls = jnp.ones(C)
    lb = jnp.zeros(C)
    got = fused_conv_ln_gelu(x, w, None, ls, lb, 2, interpret=True)
    want = _xla_reference(x, w, None, ls, lb, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
