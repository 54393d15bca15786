"""Dynamic W8A8 int8 GEMM path (ops/quant.py + Wav2Vec2Config.quant).

Pins: (1) exactness when inputs are already on the int8 grid, (2) the
deviation bound on gaussian data that makes the mode shippable, (3) layout
correctness of the einsum variants vs the plain matmul, (4) the param tree
is UNCHANGED by the quant flag (checkpoints/HF conversion unaffected), and
(5) the end-to-end encoder deviation at a tiny size.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aptai_tpu.models import tiny_config
from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder
from aptai_tpu.ops.quant import (dynamic_quantize, w8a8_head_proj,
                                 w8a8_matmul, w8a8_out_proj)


def test_w8a8_exact_on_int8_grid():
    """Rows of x / columns of w that are integer multiples of their max-abs
    scale quantize losslessly, so the product must be exact."""
    rng = np.random.default_rng(0)
    row_scales = np.array([0.5, 0.01, 3.0], np.float32)[:, None]
    col_scales = np.array([1.5, 0.25, 0.125, 2.0], np.float32)[None, :]
    x = rng.integers(-127, 128, (3, 8)).astype(np.float32)
    w = rng.integers(-127, 128, (8, 4)).astype(np.float32)
    # pin the max so the dynamic scale is exactly max/127
    x[:, 0] = 127
    w[0, :] = 127
    xs = x * row_scales
    ws = w * col_scales
    got = w8a8_matmul(jnp.asarray(xs), jnp.asarray(ws),
                      out_dtype=jnp.float32)
    want = xs @ ws
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_w8a8_zero_rows_stay_zero():
    x = jnp.zeros((4, 16), jnp.float32)
    w = jnp.ones((16, 8), jnp.float32)
    out = np.asarray(w8a8_matmul(x, w))
    assert np.all(out == 0) and np.all(np.isfinite(out))


def test_w8a8_deviation_bound_gaussian():
    """Per-row dynamic int8: ~1% relative error on gaussian data at the
    encoder's K=1024 (≈4× bf16's input-rounding error — the documented
    deviation that makes the mode opt-in rather than default)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((256, 1024)).astype(np.float32)
    w = (rng.standard_normal((1024, 512)) * 0.02).astype(np.float32)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), jnp.asarray(w),
                                 out_dtype=jnp.float32))
    want = x @ w
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.015, rel


def test_dynamic_quantize_roundtrip_bound():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 64)).astype(np.float32)
    q, s = dynamic_quantize(jnp.asarray(x), axes=-1)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - x)
    # quantization error ≤ half a step of each row's scale
    assert np.all(err <= 0.5 * np.asarray(s) + 1e-7)


def test_head_and_out_proj_match_matmul_layout():
    """The einsum variants must equal the plain quantized matmul up to
    layout (same scales, same int grid ⇒ identical values)."""
    rng = np.random.default_rng(3)
    b, t, c, h, d = 2, 6, 16, 4, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((c, h * d)) * 0.1, jnp.float32)

    got = w8a8_head_proj(x, k.reshape(c, h, d), out_dtype=jnp.float32)
    want = w8a8_matmul(x, k, out_dtype=jnp.float32)
    want = want.reshape(b, t, h, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    ctx = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    ko = jnp.asarray(rng.standard_normal((h * d, c)) * 0.1, jnp.float32)
    got_o = w8a8_out_proj(ctx, ko.reshape(h, d, c), out_dtype=jnp.float32)
    ctx_flat = ctx.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    want_o = w8a8_matmul(ctx_flat, ko, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=1e-5, atol=1e-6)


def test_quant_predictor_matches_on_tp_mesh():
    """W8A8 under DP×TP: the dynamic scales reduce over SHARDED dims in the
    row-parallel layers (weight max over the contracted model-axis shard,
    activation row max over the sharded hidden) — XLA must insert the max
    collectives and the result must equal the unsharded quantized forward."""
    import jax.numpy as jnp

    from aptai_tpu.infer import APTAIPredictor
    from aptai_tpu.models import APTAI
    from aptai_tpu.parallel import make_mesh

    cfg = dataclasses.replace(tiny_config(), quant="w8a8")
    model = APTAI(cfg, num_phonemes=cfg.vocab_size)
    rng = np.random.default_rng(5)
    audio = jnp.asarray(rng.standard_normal((1, 3200)), jnp.float32)
    lens = jnp.asarray(np.array([3200], np.int32))
    v = model.init(jax.random.PRNGKey(0), audio, lens, method="predict")

    wavs = [rng.standard_normal(4000).astype(np.float32) for _ in range(8)]
    out_m = APTAIPredictor(model, v["params"],
                           mesh=make_mesh(data=4, model=2)).predict_batch(wavs)
    out_s = APTAIPredictor(model, v["params"]).predict_batch(wavs)
    np.testing.assert_allclose(np.asarray(out_m["tvs_pred"]),
                               np.asarray(out_s["tvs_pred"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["w8a8_ffn", "w8a8"])
def test_encoder_quant_param_tree_and_deviation(mode):
    """Same param tree as the exact model (flag is pure compute), and the
    quantized forward stays close to the exact one."""
    cfg = tiny_config()
    qcfg = dataclasses.replace(cfg, quant=mode)
    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((2, 2000)), jnp.float32)
    lengths = jnp.asarray(np.array([2000, 1600], np.int32))

    enc, qenc = Wav2Vec2Encoder(cfg), Wav2Vec2Encoder(qcfg)
    v = enc.init(jax.random.PRNGKey(0), audio, lengths, True)
    qv = qenc.init(jax.random.PRNGKey(0), audio, lengths, True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(qv)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(qv)):
        assert a.shape == b.shape and a.dtype == b.dtype

    want = np.asarray(enc.apply(v, audio, lengths, True)[0])
    got = np.asarray(qenc.apply(v, audio, lengths, True)[0])
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel
