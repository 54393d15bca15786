"""Per-piece encoder profile at the inference shape (chained execution).

Times, on the real chip, the isolated pieces of one transformer layer at
the flagship inference shape (B=32, T=512, H=16, D=64, hidden 1024, bf16)
plus the composed layer and the full 24-layer stack — to locate where the
gap between the measured stack time and its GEMM roofline actually lives
(benchmarks/PERF.md round-3 target: ≥ 2300 audio-s/s).

    python benchmarks/encoder_profile.py [--iters 30]

Methodology: the axon tunnel executes lazily and charges ~30 ms per value
fetch, so each timing chains the measured op through `iters` iterations by
folding a scalar of iteration i into iteration i+1's input, then fetches
once (same as bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_time(fn, x0, iters, *static):
    """Wall time per iteration of jitted fn chained through its output."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x):
        out = fn(x, *static)
        # fold a scalar of the output back into the next input (prevents
        # CSE/reordering; keeps execution strictly chained)
        return x * 0 + out if out.shape == x.shape else x + jnp.mean(
            out).astype(x.dtype)

    x = step(x0)           # compile + 1 warm iteration
    x = step(x)            # layout-stable second call
    float(jnp.sum(x))      # force
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = step(y)
    float(jnp.sum(y))      # one fetch executes the whole chain
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from aptai_tpu.models.configs import Wav2Vec2Config
    from aptai_tpu.models.wav2vec2 import EncoderLayer
    from aptai_tpu.ops.attention import (flash_attention_bhtd,
                                         _xla_attention_bhtd)

    B, T, H, D = 32, 512, 16, 64
    HID, FFN = 1024, 4096
    dtype = jnp.bfloat16
    cfg = Wav2Vec2Config(dtype="bfloat16")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    x = jnp.asarray(rng.standard_normal((B, T, HID)), dtype)
    qkv = jnp.asarray(rng.standard_normal((B, H, T, D)), dtype)
    lengths = jnp.full((B,), T, jnp.int32)
    w_sq = jnp.asarray(rng.standard_normal((HID, HID)) * 0.02, dtype)
    w_up = jnp.asarray(rng.standard_normal((HID, FFN)) * 0.02, dtype)
    w_dn = jnp.asarray(rng.standard_normal((FFN, HID)) * 0.02, dtype)

    results = {}

    # 1 projection GEMM (B*T, 1024) x (1024, 1024)
    results["proj_gemm_ms"] = 1e3 * chain_time(
        lambda a: jnp.einsum("bth,hk->btk", a, w_sq,
                             preferred_element_type=dtype), x, args.iters)

    # flash kernel alone (fixed q/k/v, chained through a scalar)
    def flash_only(a):
        return flash_attention_bhtd(qkv + a[0, 0, 0].astype(dtype) * 0,
                                    qkv, qkv, lengths)

    results["flash_kernel_ms"] = 1e3 * chain_time(flash_only, x, args.iters)

    def xla_attn(a):
        return _xla_attention_bhtd(qkv + a[0, 0, 0].astype(dtype) * 0,
                                   qkv, qkv, lengths)

    results["xla_attention_ms"] = 1e3 * chain_time(xla_attn, x, args.iters)

    # layer norm over (B, T, 1024)
    ln = nn.LayerNorm(dtype=dtype)
    ln_vars = ln.init(key, x)
    results["layernorm_ms"] = 1e3 * chain_time(
        lambda a: ln.apply(ln_vars, a), x, args.iters)

    # FFN sublayer: up GEMM + exact GELU + down GEMM
    def ffn(a):
        h = jnp.einsum("bth,hf->btf", a, w_up, preferred_element_type=dtype)
        h = jax.nn.gelu(h, approximate=False)
        return jnp.einsum("btf,fh->bth", h, w_dn,
                          preferred_element_type=dtype)

    results["ffn_sublayer_ms"] = 1e3 * chain_time(ffn, x, args.iters)

    def gelu_only(a):
        return jax.nn.gelu(a, approximate=False)

    results["gelu_1024_ms"] = 1e3 * chain_time(gelu_only, x, args.iters)

    # one full encoder layer (the real module, real params)
    layer = EncoderLayer(cfg)
    lv = layer.init(key, x, lengths, True)
    results["encoder_layer_ms"] = 1e3 * chain_time(
        lambda a: layer.apply(lv, a, lengths, True), x, args.iters)

    # 24-layer stack (same layer params reused — timing, not numerics)
    def stack(a):
        h = a
        for _ in range(24):
            h = layer.apply(lv, h, lengths, True)
        return h

    results["stack24_ms"] = 1e3 * chain_time(stack, x, max(args.iters // 6, 3))

    # ---- stack VARIANTS (amortized over 24 layers — differences expose
    # net per-piece cost free of the ~1.3 ms per-executable dispatch
    # overhead that pollutes the isolated numbers above)
    ln_scale = jnp.ones((HID,), dtype)
    w_q = [jnp.asarray(rng.standard_normal((HID, H, D)) * 0.02, dtype)
           for _ in range(4)]
    w_o = jnp.asarray(rng.standard_normal((H, D, HID)) * 0.02, dtype)

    def lnorm(a):
        m = jnp.mean(a.astype(jnp.float32), -1, keepdims=True)
        v = jnp.var(a.astype(jnp.float32), -1, keepdims=True)
        return (((a - m) * jax.lax.rsqrt(v + 1e-5)) * ln_scale).astype(dtype)

    def layer_fn(a, gelu, use_ln, attn):
        h = lnorm(a) if use_ln else a
        q = jnp.einsum("btc,chd->bhtd", h, w_q[0],
                       preferred_element_type=dtype)
        kk = jnp.einsum("btc,chd->bhtd", h, w_q[1],
                        preferred_element_type=dtype)
        vv = jnp.einsum("btc,chd->bhtd", h, w_q[2],
                        preferred_element_type=dtype)
        ctx = attn(q, kk, vv, lengths)
        a = a + jnp.einsum("bhtd,hdc->btc", ctx, w_o,
                           preferred_element_type=dtype)
        h2 = lnorm(a) if use_ln else a
        f = gelu(jnp.einsum("bth,hf->btf", h2, w_up,
                            preferred_element_type=dtype))
        return a + jnp.einsum("btf,fh->bth", f, w_dn,
                              preferred_element_type=dtype)

    def stack_of(gelu, use_ln, attn):
        def run(a):
            h = a
            for _ in range(24):
                h = layer_fn(h, gelu, use_ln, attn)
            return h
        return run

    erf = lambda a: jax.nn.gelu(a, approximate=False)
    tanh = lambda a: jax.nn.gelu(a, approximate=True)
    it = max(args.iters // 6, 3)
    results["vstack_base_ms"] = 1e3 * chain_time(
        stack_of(erf, True, flash_attention_bhtd), x, it)
    results["vstack_tanh_gelu_ms"] = 1e3 * chain_time(
        stack_of(tanh, True, flash_attention_bhtd), x, it)
    results["vstack_no_ln_ms"] = 1e3 * chain_time(
        stack_of(erf, False, flash_attention_bhtd), x, it)
    results["vstack_xla_attn_ms"] = 1e3 * chain_time(
        stack_of(erf, True, _xla_attention_bhtd), x, it)
    results["vstack_identity_gelu_ms"] = 1e3 * chain_time(
        stack_of(lambda a: a, True, flash_attention_bhtd), x, it)

    # ---- front-end pieces (real modules, real params; 10 s audio)
    from aptai_tpu.models.wav2vec2 import (FeatureExtractor,
                                           PositionalConvEmbedding)

    audio = jnp.asarray(rng.standard_normal((B, 160_000)) * 0.1, jnp.float32)
    fe = FeatureExtractor(cfg)
    fe_vars = fe.init(key, audio)

    def fe_fn(a):
        return fe.apply(fe_vars, audio + a[0].astype(audio.dtype) * 0)

    results["feature_extractor_ms"] = 1e3 * chain_time(
        fe_fn, jnp.zeros((8,), dtype), max(args.iters // 3, 5))

    pos = PositionalConvEmbedding(cfg)
    pos_vars = pos.init(key, x)
    results["pos_conv_ms"] = 1e3 * chain_time(
        lambda a: pos.apply(pos_vars, a) + a, x, args.iters)

    # rooflines at 121 TFLOPS effective bf16 (PERF.md round-1 measurement)
    tflops = 121e12
    results["roofline_proj_ms"] = 1e3 * (2 * B * T * HID * HID) / tflops
    results["roofline_attn_core_ms"] = 1e3 * (4 * B * H * T * T * D) / tflops
    results["roofline_ffn_ms"] = 1e3 * (4 * B * T * HID * FFN) / tflops
    results["roofline_layer_ms"] = (
        4 * results["roofline_proj_ms"] + results["roofline_attn_core_ms"]
        + results["roofline_ffn_ms"])

    for k, v in results.items():
        results[k] = round(v, 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
