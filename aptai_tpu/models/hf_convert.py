"""HF/PyTorch wav2vec2 checkpoint → aptai_tpu Flax parameter conversion.

The reference initializes its backbone from HF pretrained checkpoints
(``facebook/wav2vec2-large-robust`` / ``-xlsr-53``, reference
models/w2v2_pr.py:28-33, train/start_train_phoneme_recognizer.sh).  To keep
output fidelity, this module maps an HF torch ``state_dict`` onto the
parameter tree of :class:`aptai_tpu.models.wav2vec2.Wav2Vec2Encoder` —
including the weight-normalized positional conv (both the legacy
``weight_g/weight_v`` naming and the torch≥2.1 ``parametrizations.weight``
naming) — with the layout transposes torch→flax requires:

* Conv1d ``(out, in/groups, k)`` → flax ``(k, in/groups, out)``
* Linear ``(out, in)`` → flax kernel ``(in, out)``
* LayerNorm ``weight`` → flax ``scale``

Conversion fidelity is verified against a randomly initialized
``transformers`` torch model in tests/test_hf_parity.py (no network needed).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 1, 0)


def _linear(w) -> np.ndarray:
    return _np(w).T


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_wav2vec2_encoder(
    state_dict: Mapping[str, "np.ndarray"],
    num_hidden_layers: int,
    prefix: str = "",
    fused_qkv: bool = False,
) -> Dict:
    """Convert an HF ``Wav2Vec2Model`` state_dict to the encoder param tree.

    Args:
      state_dict: torch tensors or numpy arrays, HF naming.
      num_hidden_layers: number of transformer layers to convert (the
        reference can truncate the stack via ``--num_hidden_layers``,
        train/train_phoneme_recognizer.py:152-155, 341).
      prefix: key prefix in the state_dict (e.g. ``"wav2vec2."`` for
        fine-tuned reference checkpoints).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}

    # --- conv feature extractor (layer-norm variant only; the reference's
    # backbones are all feat_extract_norm == "layer")
    if "feature_extractor.conv_layers.0.layer_norm.weight" not in sd:
        raise NotImplementedError(
            "only feat_extract_norm='layer' checkpoints are supported "
            "(wav2vec2-large family)"
        )
    fe = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        layer = {
            "conv": {"kernel": _conv(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])},
            "layer_norm": _ln(sd, f"feature_extractor.conv_layers.{i}.layer_norm"),
        }
        bias_key = f"feature_extractor.conv_layers.{i}.conv.bias"
        if bias_key in sd:
            layer["conv"]["bias"] = _np(sd[bias_key])
        fe[f"layers_{i}"] = layer
        i += 1
    params["feature_extractor"] = fe

    # --- feature projection
    params["feature_projection"] = {
        "layer_norm": _ln(sd, "feature_projection.layer_norm"),
        "projection": {
            "kernel": _linear(sd["feature_projection.projection.weight"]),
            "bias": _np(sd["feature_projection.projection.bias"]),
        },
    }
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = _np(sd["masked_spec_embed"])

    # --- positional conv embedding (weight-normalized, both namings)
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
    else:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    params["pos_conv_embed"] = {
        "weight_g": _conv(g),   # (1,1,k) -> (k,1,1)
        "weight_v": _conv(v),   # (out,in/g,k) -> (k,in/g,out)
        "bias": _np(sd[f"{pc}.bias"]),
    }

    # --- transformer layers
    for i in range(num_hidden_layers):
        p = f"encoder.layers.{i}"
        if fused_qkv:
            attention = {
                "qkv_proj": {
                    "kernel": np.concatenate(
                        [_linear(sd[f"{p}.attention.{n}.weight"])
                         for n in ("q_proj", "k_proj", "v_proj")], axis=1),
                    "bias": np.concatenate(
                        [_np(sd[f"{p}.attention.{n}.bias"])
                         for n in ("q_proj", "k_proj", "v_proj")]),
                },
                "out_proj": {
                    "kernel": _linear(sd[f"{p}.attention.out_proj.weight"]),
                    "bias": _np(sd[f"{p}.attention.out_proj.bias"]),
                },
            }
        else:
            attention = {
                name: {
                    "kernel": _linear(sd[f"{p}.attention.{name}.weight"]),
                    "bias": _np(sd[f"{p}.attention.{name}.bias"]),
                }
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            }
        params[f"layers_{i}"] = {
            "layer_norm": _ln(sd, f"{p}.layer_norm"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
            "attention": attention,
            "feed_forward": {
                "intermediate_dense": {
                    "kernel": _linear(sd[f"{p}.feed_forward.intermediate_dense.weight"]),
                    "bias": _np(sd[f"{p}.feed_forward.intermediate_dense.bias"]),
                },
                "output_dense": {
                    "kernel": _linear(sd[f"{p}.feed_forward.output_dense.weight"]),
                    "bias": _np(sd[f"{p}.feed_forward.output_dense.bias"]),
                },
            },
        }

    # --- final encoder layer norm (stable-LN) / pre-layer norm (base)
    params["layer_norm"] = _ln(sd, "encoder.layer_norm")
    return params


def convert_w2v2_pr(state_dict: Mapping, num_hidden_layers: int) -> Dict:
    """Convert a reference ``Wav2Vec2_PR`` checkpoint (wav2vec2 backbone +
    linear CTC head, reference models/w2v2_pr.py:28-36)."""
    params = {
        "encoder": convert_wav2vec2_encoder(
            state_dict, num_hidden_layers, prefix="wav2vec2."
        ),
        "pr_head": {
            "kernel": _linear(state_dict["pr_head.weight"]),
            "bias": _np(state_dict["pr_head.bias"]),
        },
    }
    return params


def export_wav2vec2_encoder(
    params: Mapping,
    num_hidden_layers: int,
    prefix: str = "",
    weight_norm_naming: str = "legacy",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_wav2vec2_encoder`: aptai_tpu encoder params
    → an HF ``Wav2Vec2Model`` state_dict (numpy).  Lets a checkpoint trained
    by this framework be loaded into the reference's torch stack for
    independent verification (scripts/parity_vs_reference.py).

    ``weight_norm_naming``: "legacy" emits ``weight_g``/``weight_v`` for the
    weight-normalized positional conv; "parametrizations" emits the
    torch ≥ 2.1 ``parametrizations.weight.original{0,1}`` names.
    """
    sd: Dict[str, np.ndarray] = {}

    def put_conv(key, w):
        sd[key] = np.asarray(w).transpose(2, 1, 0)

    def put_linear(base, leaf):
        sd[f"{base}.weight"] = np.asarray(leaf["kernel"]).T
        sd[f"{base}.bias"] = np.asarray(leaf["bias"])

    def put_ln(base, leaf):
        sd[f"{base}.weight"] = np.asarray(leaf["scale"])
        sd[f"{base}.bias"] = np.asarray(leaf["bias"])

    fe = params["feature_extractor"]
    for i in range(len(fe)):
        layer = fe[f"layers_{i}"]
        put_conv(f"feature_extractor.conv_layers.{i}.conv.weight",
                 layer["conv"]["kernel"])
        if "bias" in layer["conv"]:
            sd[f"feature_extractor.conv_layers.{i}.conv.bias"] = np.asarray(
                layer["conv"]["bias"])
        put_ln(f"feature_extractor.conv_layers.{i}.layer_norm",
               layer["layer_norm"])

    put_ln("feature_projection.layer_norm",
           params["feature_projection"]["layer_norm"])
    put_linear("feature_projection.projection",
               params["feature_projection"]["projection"])
    if "masked_spec_embed" in params:
        sd["masked_spec_embed"] = np.asarray(params["masked_spec_embed"])

    pc = "encoder.pos_conv_embed.conv"
    g = np.asarray(params["pos_conv_embed"]["weight_g"]).transpose(2, 1, 0)
    v = np.asarray(params["pos_conv_embed"]["weight_v"]).transpose(2, 1, 0)
    if weight_norm_naming == "legacy":
        sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"] = g, v
    else:
        sd[f"{pc}.parametrizations.weight.original0"] = g
        sd[f"{pc}.parametrizations.weight.original1"] = v
    sd[f"{pc}.bias"] = np.asarray(params["pos_conv_embed"]["bias"])

    for i in range(num_hidden_layers):
        p = f"encoder.layers.{i}"
        layer = params[f"layers_{i}"]
        put_ln(f"{p}.layer_norm", layer["layer_norm"])
        put_ln(f"{p}.final_layer_norm", layer["final_layer_norm"])
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_linear(f"{p}.attention.{name}", layer["attention"][name])
        put_linear(f"{p}.feed_forward.intermediate_dense",
                   layer["feed_forward"]["intermediate_dense"])
        put_linear(f"{p}.feed_forward.output_dense",
                   layer["feed_forward"]["output_dense"])

    put_ln("encoder.layer_norm", params["layer_norm"])
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def export_w2v2_pr(params: Mapping, num_hidden_layers: int,
                   weight_norm_naming: str = "legacy") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_w2v2_pr`: W2V2PR params → the reference's
    ``Wav2Vec2_PR`` state_dict layout (``wav2vec2.*`` backbone +
    ``pr_head.*``, reference models/w2v2_pr.py:28-36)."""
    sd = export_wav2vec2_encoder(params["encoder"], num_hidden_layers,
                                 prefix="wav2vec2.",
                                 weight_norm_naming=weight_norm_naming)
    sd["pr_head.weight"] = np.asarray(params["pr_head"]["kernel"]).T
    sd["pr_head.bias"] = np.asarray(params["pr_head"]["bias"])
    return sd


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.bin``/``.pt`` state_dict into numpy (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}
