"""GPipe vs interleaved pipeline schedule A/B on the virtual CPU mesh.

The interleaved/circular schedule (parallel/pipeline.py, ``interleave=V``)
divides the GPipe bubble by V: per-device executed work per step is
``ticks/V = (V·M+S−1)/V`` full-stage units against GPipe's ``M+S−1`` (the
useful work is ``M`` either way).  No multi-chip TPU exists in this
container, but the 8 virtual CPU devices SERIALIZE onto one core — so
wall-clock here measures *total executed work*, which is exactly the
quantity the bubble wastes.  Expected ratio at (S, M, V):

    t_interleaved / t_gpipe  ≈  (V·M + S − 1) / (V · (M + S − 1))

e.g. S=4, M=4, V=2 → 11/14 ≈ 0.79 (the 21% of GPipe ticks spent computing
on garbage during fill/drain that the circular schedule reclaims).  On real
hardware the same ratio shows up as idle-bubble time instead of redundant
compute, traded against V× as many (V× smaller) ICI transfers.

    JAX_PLATFORMS=cpu python benchmarks/pp_schedule_ab.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    sys.path.insert(0, ".")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from aptai_tpu.models import Wav2Vec2Encoder, Wav2Vec2Config
    from aptai_tpu.parallel.pipeline import (
        pipelined_encoder_apply, schedule_ticks,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=int, default=4)
    ap.add_argument("--micro", type=int, default=4)
    ap.add_argument("--interleave", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=512)
    args = ap.parse_args()
    s, m, v = args.stages, args.micro, args.interleave

    # big enough per-layer work that the schedule dominates dispatch
    cfg = Wav2Vec2Config(
        dtype="float32", hidden_size=args.hidden,
        num_hidden_layers=args.layers, num_attention_heads=8,
        intermediate_size=4 * args.hidden,
        conv_dim=(args.hidden,) * 7,
    )
    enc = Wav2Vec2Encoder(cfg)
    rng = np.random.default_rng(0)
    b, length = 2 * m, 16000
    audio = jnp.asarray(rng.standard_normal((b, length)).astype(np.float32))
    lens = jnp.asarray(np.full((b,), length, np.int32))
    variables = enc.init(jax.random.PRNGKey(0), audio, lens)
    mesh = Mesh(np.asarray(jax.devices()[:s]), ("pipe",))

    def timed(interleave):
        @jax.jit
        def fwd(vs, audio, lens):
            h, _, _ = pipelined_encoder_apply(
                enc, vs, audio, lens, mesh,
                num_microbatches=m, interleave=interleave,
            )
            return jnp.sum(h)

        with mesh:
            fwd(variables, audio, lens).block_until_ready()  # compile
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fwd(variables, audio, lens)
            out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters

    t_gpipe = timed(1)
    t_inter = timed(v)
    expected = schedule_ticks(m, s, v) / (v * schedule_ticks(m, s, 1))
    print(json.dumps({
        "stages": s, "microbatches": m, "interleave": v,
        "gpipe_ms": round(t_gpipe * 1e3, 1),
        "interleaved_ms": round(t_inter * 1e3, 1),
        "ratio": round(t_inter / t_gpipe, 3),
        "expected_work_ratio": round(expected, 3),
        "gpipe_bubble": round((s - 1) / schedule_ticks(m, s, 1), 3),
        "interleaved_bubble": round((s - 1) / schedule_ticks(m, s, v), 3),
    }))


if __name__ == "__main__":
    main()
