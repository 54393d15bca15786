"""AOT serving export: freeze a predictor forward into a self-contained
on-disk bundle that serves WITHOUT the framework's model code.

Deployment story the reference does not have (its inference surfaces are
eager torch methods on live model objects — reference models/aptai.py:125,
force_aptai.py:238, w2v2_pr.py:191): ``save_serving_bundle`` lowers the
jitted forward once through :mod:`jax.export` (StableHLO, multi-platform —
the same artifact runs on CPU and TPU) and writes

    <dir>/forward.stablehlo   the serialized computation
    <dir>/params.npz          weights, flat path → array
    <dir>/meta.json           static serving shape + field list + dtypes

``load_serving_bundle`` reconstructs a batched predictor from those three
files alone — no Flax module, no model config, no framework version pin
beyond jax.export's own compatibility guarantees — so a serving host needs
only jax + numpy.

The exported program has ONE static shape (the bundle's serving shape),
exactly like the live serving path (infer/server.py pads to one shape to
keep XLA compiles out of the request path); longer inputs are rejected
with the re-export hint, larger request lists are chunked.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from aptai_tpu import SAMPLE_RATE

_FORWARD = "forward.stablehlo"
_PARAMS = "params.npz"
_META = "meta.json"


def _flatten(tree) -> Dict[str, np.ndarray]:
    from flax import traverse_util

    return {k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(tree, sep="/").items()}


def _unflatten(flat: Dict[str, np.ndarray]):
    from flax import traverse_util

    return traverse_util.unflatten_dict(dict(flat), sep="/")


def save_serving_bundle(
    out_dir,
    model,
    params,
    *,
    method: str = "predict",
    batch: int = 16,
    seconds: float = 2.0,
    fields: Optional[Sequence[str]] = None,
    transfer_dtype: str = "float32",
    platforms: Sequence[str] = ("cpu", "tpu"),
    kind: Optional[str] = None,
    vocab: Optional[Dict[str, int]] = None,
) -> Path:
    """Export ``model.<method>`` at the static serving shape
    ``(batch, seconds·16k)`` and write the bundle to ``out_dir``.

    ``fields`` restricts the exported outputs exactly like
    ``predict_batch(fields=...)`` (XLA dead-code-eliminates unserved heads
    from the artifact itself).  ``transfer_dtype="int16"`` /
    ``"uint8_mulaw"`` bake the on-device dequantization in, halving /
    quartering the serving upload (infer/api.py:quantize_transfer)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from aptai_tpu.infer.api import check_fields, dequantize_transfer

    if getattr(model, "decode_method", "greedy") == "beam_host":
        # the in-jit host-callback beam search cannot serialize (and would
        # be deadlock-prone on a serving host anyway) — same refusal as
        # StreamingPredictor
        raise ValueError(
            "cannot export a decode_method='beam_host' model: its forward "
            "embeds a host-callback beam search; export a "
            "decode_method='greedy' model (the TPU-native default)"
        )

    samples = int(seconds * SAMPLE_RATE)

    def fwd(p, audio, lengths):
        audio = dequantize_transfer(audio)
        out = model.apply({"params": p}, audio, lengths, method=method)
        if fields is not None:
            check_fields(fields, out, f"{type(model).__name__}.{method}")
            keep = set(fields) | {"frame_lengths"}
            out = {k: v for k, v in out.items() if k in keep}
        return out

    audio_dtype = {"float32": jnp.float32, "int16": jnp.int16,
                   "uint8_mulaw": jnp.uint8}[transfer_dtype]
    params_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params,
    )
    exported = jexport.export(jax.jit(fwd), platforms=tuple(platforms))(
        params_spec,
        jax.ShapeDtypeStruct((batch, samples), audio_dtype),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / _FORWARD).write_bytes(exported.serialize())
    np.savez(out_dir / _PARAMS, **_flatten(params))
    (out_dir / _META).write_text(json.dumps({
        "model": type(model).__name__,
        "method": method,
        "batch": batch,
        "samples": samples,
        "fields": list(fields) if fields is not None else None,
        "transfer_dtype": transfer_dtype,
        "platforms": list(platforms),
        "sample_rate": SAMPLE_RATE,
        # serving identity: lets aptai-serve reconstruct the per-family
        # response schema (and IPA mapping) from the bundle alone
        "kind": kind,
        "vocab": vocab,
    }, indent=2))
    return out_dir


class ServingBundle:
    """A loaded bundle: batched prediction from the artifact alone."""

    def __init__(self, bundle_dir):
        from jax import export as jexport

        bundle_dir = Path(bundle_dir)
        self.meta = json.loads((bundle_dir / _META).read_text())
        with np.load(bundle_dir / _PARAMS) as z:
            self.params = _unflatten({k: z[k] for k in z.files})
        self._exported = jexport.deserialize(
            (bundle_dir / _FORWARD).read_bytes())

    def predict_batch(self, wavs: Sequence[np.ndarray]) -> Dict:
        """Pad/chunk to the exported static shape, run, and return every
        output with leading dim ``len(wavs)`` (same contract as the live
        ``predict_batch``).

        Single-chunk results stay LAZY device arrays (sliced views): the
        MicroBatcher's dispatch loop must return before execution so its
        fetch pool can overlap the device→host fetch with the next
        micro-batch's dispatch (infer/server.py) — ``np.asarray`` here
        would serialize the serving pipeline.  Multi-chunk calls (library
        use beyond the exported batch) concatenate on the host."""
        from aptai_tpu.infer.api import quantize_transfer

        batch = int(self.meta["batch"])
        samples = int(self.meta["samples"])
        if not wavs:
            raise ValueError("predict_batch needs at least one waveform")
        too_long = [i for i, w in enumerate(wavs) if len(w) > samples]
        if too_long:
            raise ValueError(
                f"input(s) {too_long} exceed the exported serving shape of "
                f"{samples} samples ({samples / SAMPLE_RATE:.1f} s); "
                "re-export with a larger `seconds`"
            )
        parts = []
        for lo in range(0, len(wavs), batch):
            group = wavs[lo:lo + batch]
            audio = np.zeros((batch, samples), np.float32)
            lengths = np.zeros((batch,), np.int32)
            for i, w in enumerate(group):
                audio[i, : len(w)] = np.asarray(w, np.float32)
                lengths[i] = len(w)
            # pad rows: full-length silence (infer/api.py:_prepare contract)
            lengths[len(group):] = samples
            audio = quantize_transfer(audio, self.meta["transfer_dtype"])
            out = self._exported.call(self.params, audio, lengths)
            parts.append({k: v[: len(group)] for k, v in out.items()})
        if len(parts) == 1:
            return parts[0]
        return {k: np.concatenate([np.asarray(p[k]) for p in parts], axis=0)
                for k in parts[0]}


def load_serving_bundle(bundle_dir) -> ServingBundle:
    return ServingBundle(bundle_dir)


def is_bundle(path) -> bool:
    """True when ``path`` is a serving bundle directory (vs a trainer
    checkpoint)."""
    p = Path(path)
    return (p / _FORWARD).is_file() and (p / _META).is_file()


def main(argv=None) -> int:
    """``aptai-export``: trainer checkpoint → AOT serving bundle.

    Completes the deployment story: train → ``aptai-export`` → serve the
    bundle anywhere jax + numpy run (``aptai-serve --checkpoint <bundle>``
    or :class:`ServingBundle` directly), no model code or checkpoint
    loader on the host."""
    import argparse

    p = argparse.ArgumentParser(
        prog="aptai-export",
        description="Export a trainer checkpoint as a self-contained AOT "
                    "serving bundle (StableHLO + weights + metadata)")
    p.add_argument("checkpoint", help="trainer run dir / best-model-ckpt dir")
    p.add_argument("out_dir", help="bundle output directory")
    p.add_argument("--batch", type=int, default=16,
                   help="static serving batch size")
    p.add_argument("--seconds", type=float, default=10.0,
                   help="static serving audio length cap")
    p.add_argument("--fields", default="",
                   help="comma list; default: the family's serving set")
    p.add_argument("--transfer_dtype", default="float32",
                   choices=("float32", "int16", "uint8_mulaw"),
                   help="wire audio encoding baked into the artifact")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of XLA platforms the artifact targets")
    p.add_argument("--dtype", default=None,
                   help="compute dtype override (e.g. bfloat16 for a TPU-"
                        "only bundle, float32 for CPU parity)")
    args = p.parse_args(argv)

    # tracing is ahead-of-time: run it on CPU regardless of the local
    # backend (multi-platform lowering comes from `platforms`, not from
    # the tracing device)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from aptai_tpu.infer.loader import load_model
    from aptai_tpu.infer.serve import KIND_FIELDS

    kind, model, params, vocab = load_model(args.checkpoint,
                                            dtype=args.dtype)
    method = "encode" if kind == "w2v2_pr" else "predict"
    fields = ([f for f in args.fields.split(",") if f]
              or list(KIND_FIELDS[kind]))
    try:
        out = save_serving_bundle(
            args.out_dir, model, params, method=method, batch=args.batch,
            seconds=args.seconds, fields=fields,
            transfer_dtype=args.transfer_dtype,
            platforms=tuple(s for s in args.platforms.split(",") if s),
            kind=kind, vocab=vocab,
        )
    except ValueError as e:  # e.g. beam_host models cannot serialize
        import sys

        print(f"aptai-export: {e}", file=sys.stderr)
        return 2
    size = sum(f.stat().st_size for f in out.iterdir())
    print(json.dumps({
        "bundle": str(out), "kind": kind, "batch": args.batch,
        "seconds": args.seconds, "fields": fields,
        "platforms": args.platforms.split(","),
        "bytes": size,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
