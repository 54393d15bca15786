"""Model construction for the trainers: config assembly, initialization,
pretrained-weight conversion, and PR-checkpoint embedding for FORCE-APTAI."""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aptai_tpu.models import (
    APTAI,
    ForceAPTAI,
    W2V2PR,
    Wav2Vec2Config,
    convert_wav2vec2_encoder,
    convert_w2v2_pr,
)
from aptai_tpu.train.checkpoints import load_json, load_pytree


def resolve_dtype(dtype: str) -> str:
    """``"auto"`` → bfloat16 on TPU, float32 elsewhere.

    The compute dtype is independent of parameter/optimizer storage (Flax
    params and Adam moments stay float32 — standard TPU mixed precision),
    so ``auto`` gives the trainer CLIs the same bf16 MXU path every
    benchmark measures (benchmarks/PERF.md); ``--dtype float32`` restores
    the reference's full-precision numerics (reference trains f32 on GPU,
    SURVEY.md §2.2)."""
    if dtype and dtype != "auto":
        return dtype
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


def make_backbone_config(cfg_train, vocab_size: int) -> Wav2Vec2Config:
    """HF-config-dict + overrides, the reference's recipe
    (train/train_phoneme_recognizer.py:336-347)."""
    cfg = Wav2Vec2Config(
        vocab_size=vocab_size,
        final_dropout=cfg_train.final_dropout,
        num_hidden_layers=cfg_train.num_hidden_layers,
        dtype=resolve_dtype(getattr(cfg_train, "dtype", "float32")),
        remat_policy=getattr(cfg_train, "remat_policy", "none"),
    )
    if getattr(cfg_train, "ten_ms", False):
        cfg = cfg.with_ten_ms()
    return cfg


@functools.lru_cache(maxsize=2)
def _converted_encoder(checkpoint: str, num_layers: int) -> Dict:
    """Convert (and cache) an HF torch checkpoint — LOSO folds re-splice the
    same pretrained tree instead of re-reading the .bin per speaker."""
    from aptai_tpu.models.hf_convert import load_torch_state_dict

    sd = load_torch_state_dict(checkpoint)
    return convert_wav2vec2_encoder(sd, num_layers)


def _graft_pretrained_encoder(target_encoder: Dict, path: str) -> Dict:
    """Copy the ``encoder`` subtree of a checkpoint saved by THIS framework
    (e.g. a ``train/pretrain.py`` run) into ``target_encoder`` leaf-by-leaf.

    Grafting by flattened key (instead of a strict structure restore) lets
    a pretraining tower (which carries ``masked_spec_embed``) land in a
    fine-tune config with SpecAugment off, and vice versa — intersecting
    leaves transfer, the rest keep their fresh init, and a mismatch summary
    is printed so silent-miss bugs can't hide."""
    from flax import serialization
    from flax.traverse_util import flatten_dict, unflatten_dict

    file = Path(path)
    if file.is_dir():
        from aptai_tpu.infer.loader import resolve_checkpoint_dir

        file = resolve_checkpoint_dir(file) / "params.msgpack"
    raw = serialization.msgpack_restore(file.read_bytes())
    src = raw.get("encoder", raw)  # full tree or already the subtree
    flat_src = flatten_dict(src)
    flat_dst = dict(flatten_dict(target_encoder))
    hit = miss = 0
    for k, v in flat_src.items():
        if k in flat_dst:
            if flat_dst[k].shape != np.shape(v):
                raise ValueError(
                    f"pretrained encoder leaf {'/'.join(k)} has shape "
                    f"{np.shape(v)}, target expects {flat_dst[k].shape} — "
                    "backbone configs differ")
            flat_dst[k] = np.asarray(v)
            hit += 1
        else:
            miss += 1
    print(f"pretrained encoder graft from {file}: {hit} leaves spliced"
          + (f", {miss} source-only leaves skipped" if miss else ""))
    if hit == 0:
        raise ValueError(f"no overlapping encoder leaves found in {file}")
    return unflatten_dict(flat_dst)


def _maybe_load_pretrained(params: Dict, checkpoint: Optional[str],
                           num_layers: int, scope: str) -> Dict:
    """Splice pretrained encoder weights into a freshly initialized tree.

    ``checkpoint`` is either a torch ``.bin``/``.pt`` state dict (HF
    wav2vec2 conversion — the reference's from_pretrained dependency,
    models/w2v2_pr.py:28-33) or a checkpoint directory / ``params.msgpack``
    produced by this framework's own self-supervised pretrainer
    (train/pretrain.py) — the in-container replacement for that external
    artifact."""
    if not checkpoint:
        return params
    params = dict(params)
    if checkpoint.endswith((".bin", ".pt", ".pth")):
        params[scope] = jax.tree.map(
            np.copy, _converted_encoder(checkpoint, num_layers)
        )
    else:
        params[scope] = _graft_pretrained_encoder(params[scope], checkpoint)
    return params


def build_pr_model(cfg_train, vocab: Dict[str, int], example_audio_len=3200,
                   tiny=None, seed=None) -> Tuple[W2V2PR, Dict, Dict]:
    backbone = tiny if tiny is not None else make_backbone_config(
        cfg_train, len(vocab))
    if tiny is not None:
        backbone = dataclasses.replace(backbone, vocab_size=len(vocab))
    model = W2V2PR(backbone,
                   freeze_feature_encoder=cfg_train.freeze_feature_extractor)
    audio = jnp.zeros((1, example_audio_len), jnp.float32)
    lengths = jnp.full((1,), example_audio_len, jnp.int32)
    labels = jnp.full((1, 4), -100, jnp.int32)
    variables = model.init(jax.random.PRNGKey(cfg_train.seed if seed is None else seed), audio,
                           lengths, labels)
    params = _maybe_load_pretrained(
        dict(variables["params"]), cfg_train.pretrained_checkpoint,
        backbone.num_hidden_layers, "encoder",
    )
    model_cfg = {"backbone": dataclasses.asdict(backbone), "vocab": vocab,
                 "kind": "w2v2_pr"}
    return model, params, model_cfg


def build_aptai_model(cfg_train, vocab: Dict[str, int], example_audio_len=3200,
                      tiny=None, seed=None) -> Tuple[APTAI, Dict, Dict]:
    backbone = tiny if tiny is not None else make_backbone_config(
        cfg_train, len(vocab))
    model = APTAI(
        backbone,
        tv_drop=getattr(cfg_train, "tv_drop", 0.1),
        phn_drop=getattr(cfg_train, "phn_drop", 0.1),
        num_phonemes=len(vocab),
    )
    audio = jnp.zeros((1, example_audio_len), jnp.float32)
    lengths = jnp.full((1,), example_audio_len, jnp.int32)
    t = int(backbone.feat_extract_output_lengths(np.asarray(example_audio_len)))
    variables = model.init(
        jax.random.PRNGKey(cfg_train.seed if seed is None else seed), audio, lengths,
        jnp.zeros((1, t), jnp.int32), jnp.zeros((1, t, 9)),
    )
    params = _maybe_load_pretrained(
        dict(variables["params"]), cfg_train.pretrained_checkpoint,
        backbone.num_hidden_layers, "encoder",
    )
    model_cfg = {"backbone": dataclasses.asdict(backbone), "vocab": vocab,
                 "kind": "aptai"}
    return model, params, model_cfg


def build_force_model(cfg_train, vocab: Dict[str, int],
                      pr_model_path: Optional[str],
                      example_audio_len=3200,
                      tiny=None, seed=None) -> Tuple[ForceAPTAI, Dict, Dict]:
    """FORCE-APTAI over a frozen PR checkpoint
    (reference models/force_aptai.py:60-78): the PR weights are loaded from
    ``<pr_model_path>/best-model-ckpt`` and spliced under ``w2v2_pr``."""
    if tiny is not None:
        backbone = tiny
    else:
        pr_cfg = load_json(Path(pr_model_path) / "best-model-ckpt"
                           / "model_cfg.json")
        backbone = Wav2Vec2Config(**{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in pr_cfg["backbone"].items()
        })
        # compute dtype is run-local, not a checkpoint property (params
        # are stored f32 either way) — resolve it for THIS run's backend
        backbone = dataclasses.replace(
            backbone,
            dtype=resolve_dtype(getattr(cfg_train, "dtype", "auto")))
    model = ForceAPTAI(
        backbone, vocab_size=len(vocab),
        decode_method=getattr(cfg_train, "decode_method", "greedy"),
        blank_logprob=getattr(cfg_train, "blank_logprob", -1.0),
        off_diag_prior=getattr(cfg_train, "off_diag_prior", False),
        prior_g=getattr(cfg_train, "prior_g", 0.2),
        energy_temperature=getattr(cfg_train, "energy_temperature", 1.0),
        aux_frame_ce_weight=getattr(cfg_train, "aux_frame_ce", 0.0),
        frame_hidden_layer=getattr(cfg_train, "frame_hidden_layer", -1),
    )
    audio = jnp.zeros((1, example_audio_len), jnp.float32)
    lengths = jnp.full((1,), example_audio_len, jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(cfg_train.seed if seed is None else seed), audio, lengths,
        jnp.zeros((1, 200, 9)),
    )
    params = dict(variables["params"])
    spliced = False
    if pr_model_path is not None:
        ckpt_file = Path(pr_model_path) / "best-model-ckpt" / "params.msgpack"
        if ckpt_file.exists():
            params["w2v2_pr"] = load_pytree(ckpt_file, params["w2v2_pr"])
            spliced = True
        elif (Path(pr_model_path) / "best-model-ckpt"
              / "pytorch_model.bin").exists():
            # reference-format torch checkpoint (pytorch_model.bin)
            from aptai_tpu.models.hf_convert import load_torch_state_dict

            sd = load_torch_state_dict(
                str(Path(pr_model_path) / "best-model-ckpt"
                    / "pytorch_model.bin"))
            params["w2v2_pr"] = convert_w2v2_pr(
                sd, backbone.num_hidden_layers)
            spliced = True
    # pr_spliced ⇒ the frozen tower is the CHECKPOINT's weights, identical
    # in every LOSO fold (fold re-inits only reroll the head) — the
    # precondition for sharing one frozen-encoding cache across folds
    model_cfg = {"backbone": dataclasses.asdict(backbone), "vocab": vocab,
                 "kind": "force_aptai", "pr_model_path": str(pr_model_path),
                 "pr_spliced": spliced,
                 # recorded so infer.load_predictor rebuilds the exact
                 # forward (greedy vs split beam_host) from the checkpoint
                 "decode_method": getattr(cfg_train, "decode_method",
                                          "greedy"),
                 # alignment knobs: energy_temperature changes the EMITTED
                 # alignment (get_alignment), so the predictor must rebuild
                 # with the training-time values; the loss-only knobs ride
                 # along for provenance
                 "blank_logprob": getattr(cfg_train, "blank_logprob", -1.0),
                 "off_diag_prior": getattr(cfg_train, "off_diag_prior",
                                           False),
                 "prior_g": getattr(cfg_train, "prior_g", 0.2),
                 "energy_temperature": getattr(cfg_train,
                                               "energy_temperature", 1.0),
                 "aux_frame_ce": getattr(cfg_train, "aux_frame_ce", 0.0),
                 "frame_hidden_layer": getattr(cfg_train,
                                               "frame_hidden_layer", -1)}
    return model, params, model_cfg
