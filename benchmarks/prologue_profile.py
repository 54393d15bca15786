"""Split the composed encoder time into prologue vs layer stack, composed.

predict_glue_profile found predict ≈ encoder (heads are free) at ~123 ms,
while the isolated module sums (FE 18.5 + pos 5.3 + stack-at-T=512 83.9
+ small glue) leave ~10 ms unaccounted.  Two composed programs pin where
it lives:

  * prologue-only: the REAL encoder forward with ``layer_stack_fn`` set to
    identity — FE → projection → pos-conv → final LN → masks, no layers;
  * encoder-full: the same forward with the built-in 24-layer loop
    (cached from predict_glue_profile).

``encoder_full − prologue_only`` is the layer stack AS COMPOSED (at the
real T=499 frame count and with per-row length masks), directly comparable
to the isolated T=512 stack number.

    python benchmarks/prologue_profile.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.predict_glue_profile import chain_args_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from aptai_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from aptai_tpu.models import APTAI, Wav2Vec2Config
    from aptai_tpu.models.wav2vec2 import Wav2Vec2Encoder

    B, SECONDS = 32, 10
    cfg = Wav2Vec2Config(dtype="bfloat16")
    rng = np.random.default_rng(0)
    samples = 16_000 * SECONDS
    audio = jnp.asarray(rng.standard_normal((B, samples)) * 0.1, jnp.float32)
    lengths = jnp.asarray(np.full((B,), samples, np.int32))

    model = APTAI(cfg, num_phonemes=46)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(
            lambda k: model.init(
                k, jnp.zeros((1, 16000), jnp.float32),
                jnp.full((1,), 16000, jnp.int32), method="predict",
            ), backend="cpu")(jax.random.PRNGKey(0))
    enc_params = jax.device_put(variables["params"]["encoder"],
                                jax.devices()[0])

    enc = Wav2Vec2Encoder(cfg)
    z = jnp.float32(0.0)
    results = {}

    @jax.jit
    def prologue_only(p, a, l, chain):
        h, _, _ = enc.apply({"params": p}, a + 0.0 * chain, l,
                            deterministic=True,
                            layer_stack_fn=lambda x, fl: x)
        return jnp.sum(h).astype(jnp.float32)

    results["prologue_only_ms"] = 1e3 * chain_args_time(
        prologue_only, enc_params, (audio, lengths), z, args.iters)

    @jax.jit
    def encoder_full(p, a, l, chain):
        h, _, _ = enc.apply({"params": p}, a + 0.0 * chain, l,
                            deterministic=True)
        return jnp.sum(h).astype(jnp.float32)

    results["encoder_full_ms"] = 1e3 * chain_args_time(
        encoder_full, enc_params, (audio, lengths), z, args.iters)

    results["stack_composed_ms"] = (
        results["encoder_full_ms"] - results["prologue_only_ms"])

    for k, v in results.items():
        results[k] = round(float(v), 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
