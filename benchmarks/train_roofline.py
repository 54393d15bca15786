"""Training-step roofline: per-module fwd+bwd vs the GEMM floor.

VERDICT r3 missing #4: the inference stack got the full roofline treatment
(benchmarks/encoder_profile.py — measured AT its GEMM roofline after the
erf and pad fixes); the training step had a cost decomposition
(train_profile.py) but no fwd+bwd GEMM-roofline comparison.  This
benchmark measures, at the blessed training shape (8×5 s, T=249) and the
batch-16 production-throughput shape:

  * the 24-layer variant stack (same hand-rolled layer as
    encoder_profile.py so numbers compose) — forward only AND
    value_and_grad **with respect to the weights** (dgrad + wgrad, the
    real training backward);
  * attention fwd+bwd under BOTH dispatches (XLA — the measured winner at
    the small train shape, ops/attention.py:_FLASH_MIN_LOGITS_BYTES — and
    the Pallas flash backward) so the dispatch threshold's bwd side is
    pinned, not inherited from the round-2 forward A/B;
  * FFN-only and attention-only stacks (per-sublayer split);
  * the conv feature extractor fwd+bwd (frozen in APTAI by reference
    default, aptai.py:33-40 — so its *wgrad* is not on the shipped path;
    measured both ways);
  * analytic GEMM rooflines from utils/flops.py at 3× forward FLOPs
    (dgrad + wgrad each replay every GEMM once) against the effective
    bf16 MXU rate (--tflops, default the measured 121).

    python benchmarks/train_roofline.py [--configs 8x5,16x5] [--iters 10]

Methodology: chained execution, one scalar fetch (bench.py / PERF.md).
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
    ap.add_argument("--configs", default="8x5")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tflops", type=float, default=121.0,
                    help="effective bf16 GEMM TFLOP/s for the roofline "
                         "(PERF.md round-1 measured MXU rate)")
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.models.configs import Wav2Vec2Config
    from aptai_tpu.ops.attention import (_mha_bhtd_flash,
                                         _xla_attention_bhtd,
                                         multi_head_attention_bhtd)
    from aptai_tpu.utils.flops import conv_fe_flops

    backend = jax.default_backend()
    if backend == "tpu":
        cfg = Wav2Vec2Config(dtype="bfloat16")
        HID, FFN, H, D, LAYERS = 1024, 4096, 16, 64, 24
        dtype = jnp.bfloat16
    else:  # CPU smoke: tiny dims, same code paths
        cfg = Wav2Vec2Config(dtype="float32", hidden_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             intermediate_size=128, conv_dim=(32,) * 7)
        HID, FFN, H, D, LAYERS = 64, 128, 4, 16, 2
        dtype = jnp.float32

    configs = [tuple(int(v) for v in c.split("x"))
               for c in args.configs.split(",")]
    if backend != "tpu":
        configs = [(2, 1)]

    for B, seconds in configs:
        samples = 16_000 * seconds
        T = int(cfg.feat_extract_output_lengths(np.asarray(samples)))
        rng = np.random.default_rng(0)
        results = {"batch": B, "seconds": seconds, "frames": T,
                   "tflops_assumed": args.tflops}

        x = jnp.asarray(rng.standard_normal((B, T, HID)), dtype)
        lengths = jnp.full((B,), T, jnp.int32)
        ln_scale = jnp.ones((HID,), dtype)
        weights = {
            "wq": jnp.asarray(rng.standard_normal((HID, H, D)) * 0.02, dtype),
            "wk": jnp.asarray(rng.standard_normal((HID, H, D)) * 0.02, dtype),
            "wv": jnp.asarray(rng.standard_normal((HID, H, D)) * 0.02, dtype),
            "wo": jnp.asarray(rng.standard_normal((H, D, HID)) * 0.02, dtype),
            "wup": jnp.asarray(rng.standard_normal((HID, FFN)) * 0.02, dtype),
            "wdn": jnp.asarray(rng.standard_normal((FFN, HID)) * 0.02, dtype),
        }

        def lnorm(a):
            m = jnp.mean(a.astype(jnp.float32), -1, keepdims=True)
            v = jnp.var(a.astype(jnp.float32), -1, keepdims=True)
            return (((a - m) * jax.lax.rsqrt(v + 1e-5)) * ln_scale
                    ).astype(dtype)

        gelu = (lambda a: jax.nn.gelu(a, approximate=True)) \
            if dtype == jnp.bfloat16 else \
            (lambda a: jax.nn.gelu(a, approximate=False))

        def attn_sublayer(a, w, attn):
            h = lnorm(a)
            q = jnp.einsum("btc,chd->bhtd", h, w["wq"],
                           preferred_element_type=dtype)
            k = jnp.einsum("btc,chd->bhtd", h, w["wk"],
                           preferred_element_type=dtype)
            v = jnp.einsum("btc,chd->bhtd", h, w["wv"],
                           preferred_element_type=dtype)
            ctx = attn(q, k, v, lengths)
            return a + jnp.einsum("bhtd,hdc->btc", ctx, w["wo"],
                                  preferred_element_type=dtype)

        def ffn_sublayer(a, w):
            h = gelu(jnp.einsum("bth,hf->btf", lnorm(a), w["wup"],
                                preferred_element_type=dtype))
            return a + jnp.einsum("btf,fh->bth", h, w["wdn"],
                                  preferred_element_type=dtype)

        def make_stack(pieces, attn):
            def run(w, a):
                h = a
                for _ in range(LAYERS):
                    if "attn" in pieces:
                        h = attn_sublayer(h, w, attn)
                    if "ffn" in pieces:
                        h = ffn_sublayer(h, w)
                return h
            return run

        def time_fwd(run, label):
            @jax.jit
            def step(carry):
                a, acc = carry
                h = run(weights, a + 0 * acc.astype(dtype))
                return (a, acc + jnp.mean(h).astype(jnp.float32))

            c = step((x, jnp.float32(0)))
            c = step(c)
            _ = float(c[1])
            t0 = time.perf_counter()
            y = c
            for _ in range(args.iters):
                y = step(y)
            _ = float(y[1])
            ms = 1e3 * (time.perf_counter() - t0) / args.iters
            results[label] = round(ms, 2)
            print(f"  {label}: {ms:.2f} ms", file=sys.stderr)

        def time_fwd_bwd(run, label, w0=None):
            """value_and_grad wrt the WEIGHTS (+ input): dgrad + wgrad."""
            @jax.jit
            def step(carry):
                w, acc = carry

                def loss(w_, a_):
                    return jnp.mean(
                        run(w_, a_).astype(jnp.float32) ** 2)

                (l, gw) = jax.value_and_grad(loss)(
                    w, x + 0 * acc.astype(dtype))
                # feed a tiny grad step back into the carried weights:
                # every wgrad leaf is consumed AND the chain stays
                # strictly sequential
                w = jax.tree.map(lambda p, g: p - (1e-12 * g).astype(
                    p.dtype), w, gw)
                return (w, acc + l)

            c = step((weights if w0 is None else w0, jnp.float32(0)))
            c = step(c)
            _ = float(c[1])
            t0 = time.perf_counter()
            y = c
            for _ in range(args.iters):
                y = step(y)
            _ = float(y[1])
            ms = 1e3 * (time.perf_counter() - t0) / args.iters
            results[label] = round(ms, 2)
            print(f"  {label}: {ms:.2f} ms", file=sys.stderr)

        # ---- the stack under the SHIPPED dispatch and both forced paths
        dispatch = make_stack(("attn", "ffn"), multi_head_attention_bhtd)
        time_fwd(dispatch, "stack_fwd_ms")
        time_fwd_bwd(dispatch, "stack_fwd_bwd_ms")
        time_fwd_bwd(make_stack(("attn", "ffn"), _xla_attention_bhtd),
                     "stack_fwd_bwd_xla_attn_ms")
        if backend == "tpu":
            # the Pallas flash custom-vjp pair (fwd saves lse; bwd = dq +
            # dk/dv kernels) — off-TPU the kernels only exist in interpret
            # mode and time nothing meaningful
            time_fwd_bwd(make_stack(("attn", "ffn"), _mha_bhtd_flash),
                         "stack_fwd_bwd_flash_attn_ms")

        # ---- per-sublayer split (same dispatch as shipped)
        time_fwd_bwd(make_stack(("attn",), multi_head_attention_bhtd),
                     "attn_only_fwd_bwd_ms")
        time_fwd_bwd(make_stack(("ffn",), multi_head_attention_bhtd),
                     "ffn_only_fwd_bwd_ms")

        # ---- conv feature extractor fwd / fwd+bwd (frozen by reference
        # default in APTAI => wgrad off the shipped path; measured anyway)
        from aptai_tpu.models.wav2vec2 import FeatureExtractor

        audio = jnp.asarray(rng.standard_normal((B, samples)) * 0.1,
                            jnp.float32)
        fe = FeatureExtractor(cfg)
        fe_vars = fe.init(jax.random.PRNGKey(0), audio)

        def fe_run(w, a):
            del a
            return fe.apply(w, audio)

        @jax.jit
        def fe_fwd(carry):
            w, acc = carry
            return (w, acc + jnp.mean(
                fe.apply(w, audio + 0 * acc.astype(audio.dtype))
            ).astype(jnp.float32))

        c = fe_fwd((fe_vars, jnp.float32(0)))
        c = fe_fwd(c)
        _ = float(c[1])
        t0 = time.perf_counter()
        y = c
        for _ in range(args.iters):
            y = fe_fwd(y)
        _ = float(y[1])
        results["fe_fwd_ms"] = round(
            1e3 * (time.perf_counter() - t0) / args.iters, 2)
        time_fwd_bwd(fe_run, "fe_fwd_bwd_ms", w0=fe_vars)

        # ---- analytic GEMM rooflines (3x forward for fwd+bwd)
        rate = args.tflops * 1e9  # FLOPs per ms
        proj = 8 * B * T * HID * HID            # 4 projections, 2 FLOP/MAC
        core = 4 * B * H * T * T * D
        ffn_f = 4 * B * T * HID * FFN
        layer_fwd = proj + core + ffn_f
        results["roofline_stack_fwd_ms"] = round(
            LAYERS * layer_fwd / rate, 3)
        results["roofline_stack_fwd_bwd_ms"] = round(
            3 * LAYERS * layer_fwd / rate, 3)
        results["roofline_ffn_fwd_bwd_ms"] = round(
            3 * LAYERS * ffn_f / rate, 3)
        results["roofline_attn_fwd_bwd_ms"] = round(
            3 * LAYERS * (proj + core) / rate, 3)
        fe_f = B * conv_fe_flops(cfg, samples)
        results["roofline_fe_fwd_ms"] = round(fe_f / rate, 3)
        if results["roofline_stack_fwd_bwd_ms"] >= 0.01:
            results["stack_fwd_bwd_vs_roofline"] = round(
                results["stack_fwd_bwd_ms"]
                / results["roofline_stack_fwd_bwd_ms"], 2)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
