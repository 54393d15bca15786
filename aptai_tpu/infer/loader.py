"""Checkpoint-directory → predictor loading.

The trainers (train/train_pr.py, train/train_aptai.py,
train/train_force_aptai.py) save ``model_cfg.json`` (backbone config +
vocab + model kind) next to ``params.msgpack`` in every best/last
checkpoint directory (train/checkpoints.py).  That makes a saved
checkpoint self-describing — this module turns one back into a live,
jit-compiled predictor in one call:

    from aptai_tpu.infer import load_predictor
    pred = load_predictor("experiments/aptai/<run>")   # or .../best-model-ckpt
    out = pred.get_aptai_output(wav)

The reference has no equivalent: reloading its checkpoints requires
re-assembling the HF config dict + model class by hand
(reference models/force_aptai.py:61-78 is the one hard-coded instance).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aptai_tpu.infer.api import (
    APTAIPredictor,
    ForceAPTAIPredictor,
    W2V2PRPredictor,
)
from aptai_tpu.models import APTAI, ForceAPTAI, W2V2PR, Wav2Vec2Config
from aptai_tpu.train.checkpoints import load_json, load_pytree


def resolve_checkpoint_dir(path) -> Path:
    """Accept an experiment dir, a ``best-model-ckpt``/``last-model-ckpt``
    dir, or a per-epoch ``model-ckpts/eNNNN`` dir; return the directory that
    actually holds ``params.msgpack``."""
    p = Path(path)
    if (p / "params.msgpack").exists():
        return p
    for sub in ("best-model-ckpt", "last-model-ckpt"):
        if (p / sub / "params.msgpack").exists():
            return p / sub
    raise FileNotFoundError(
        f"no params.msgpack under {p} (looked in ., best-model-ckpt/, "
        "last-model-ckpt/)")


def _find_model_cfg(ckpt_dir: Path) -> Dict:
    """model_cfg.json lives next to the params for best/last checkpoints;
    per-epoch dirs (model-ckpts/eNNNN) fall back to the run's best/last."""
    for d in (ckpt_dir, ckpt_dir.parent.parent / "best-model-ckpt",
              ckpt_dir.parent.parent / "last-model-ckpt"):
        if (d / "model_cfg.json").exists():
            return load_json(d / "model_cfg.json")
    raise FileNotFoundError(f"no model_cfg.json for checkpoint {ckpt_dir}")


def backbone_from_dict(d: Dict) -> Wav2Vec2Config:
    """JSON round-trip: lists back to tuples (dataclasses.asdict serialized
    the tuple fields as lists)."""
    return Wav2Vec2Config(**{
        k: tuple(v) if isinstance(v, list) else v for k, v in d.items()
    })


def load_model(path, dtype: Optional[str] = None,
               quant: Optional[str] = None,
               ) -> Tuple[str, object, Dict, Dict[str, int]]:
    """Rebuild (kind, model, params, vocab) from a checkpoint directory.

    ``dtype`` overrides the compute dtype recorded at training time (e.g.
    load a bf16-trained checkpoint for f32 CPU inference — parameters are
    stored full-precision either way, checkpoints.py).  ``quant`` turns on
    the dynamic W8A8 int8 inference GEMMs ("w8a8_ffn" / "w8a8" — the param
    tree is quant-invariant, so any checkpoint serves quantized;
    ops/quant.py documents the deviation contract)."""
    ckpt_dir = resolve_checkpoint_dir(path)
    cfg = _find_model_cfg(ckpt_dir)
    backbone = backbone_from_dict(cfg["backbone"])
    if dtype is not None:
        backbone = dataclasses.replace(backbone, dtype=dtype)
    if quant is not None:
        backbone = dataclasses.replace(backbone, quant=quant)
    vocab = cfg["vocab"]
    kind = cfg["kind"]

    n = 3200  # tiny init example: structure only, weights are replaced
    audio = jnp.zeros((1, n), jnp.float32)
    lengths = jnp.full((1,), n, jnp.int32)
    key = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        if kind == "w2v2_pr":
            model = W2V2PR(backbone)
            example = model.init(key, audio, lengths,
                                 jnp.full((1, 4), -100, jnp.int32))["params"]
        elif kind == "aptai":
            model = APTAI(backbone, num_phonemes=len(vocab))
            t = int(backbone.feat_extract_output_lengths(np.asarray(n)))
            example = model.init(key, audio, lengths,
                                 jnp.zeros((1, t), jnp.int32),
                                 jnp.zeros((1, t, 9)))["params"]
        elif kind == "force_aptai":
            model = ForceAPTAI(
                backbone, vocab_size=len(vocab),
                decode_method=cfg.get("decode_method", "greedy"),
                # energy_temperature shapes the emitted alignment; the
                # loss knobs are inert at inference but keep the module
                # config faithful to the checkpoint (builders.py)
                blank_logprob=cfg.get("blank_logprob", -1.0),
                off_diag_prior=cfg.get("off_diag_prior", False),
                prior_g=cfg.get("prior_g", 0.2),
                energy_temperature=cfg.get("energy_temperature", 1.0),
                aux_frame_ce_weight=cfg.get("aux_frame_ce", 0.0),
                frame_hidden_layer=cfg.get("frame_hidden_layer", -1),
            )
            example = model.init(key, audio, lengths,
                                 jnp.zeros((1, 200, 9)))["params"]
        else:
            raise ValueError(f"unknown model kind {kind!r} in model_cfg.json")

    params = load_pytree(ckpt_dir / "params.msgpack", dict(example))
    return kind, model, params, vocab


def load_predictor(path, mesh=None, transfer_dtype: str = "float32",
                   dtype: Optional[str] = None,
                   quant: Optional[str] = None):
    """One call from a trainer checkpoint directory to the matching live
    predictor (APTAIPredictor / ForceAPTAIPredictor / W2V2PRPredictor).

    ``mesh`` / ``transfer_dtype`` forward to the predictor (multi-chip
    serving and int16 audio upload — infer/api.py)."""
    kind, model, params, vocab = load_model(path, dtype=dtype, quant=quant)
    if kind == "w2v2_pr":
        return W2V2PRPredictor(model, params, vocab, mesh=mesh,
                               transfer_dtype=transfer_dtype)
    if kind == "aptai":
        return APTAIPredictor(model, params, mesh=mesh,
                              transfer_dtype=transfer_dtype)
    return ForceAPTAIPredictor(model, params, mesh=mesh,
                               transfer_dtype=transfer_dtype)
