"""Model configuration dataclasses.

``Wav2Vec2Config`` mirrors the subset of the HF wav2vec2 configuration the
reference relies on (reference train/train_phoneme_recognizer.py:336-347
builds an HF config dict and overrides vocab_size / final_dropout /
num_hidden_layers / ctc fields / conv_stride).  Defaults correspond to
``facebook/wav2vec2-large-robust`` — the production backbone of the
reference (reference train/start_train_phoneme_recognizer.sh) — which is
architecturally identical to ``wav2vec2-large-xlsr-53`` (the code default,
train_phoneme_recognizer.py:166): 24 pre-norm transformer layers, hidden
1024, 16 heads, FFN 4096, layer-norm conv feature extractor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    # transformer encoder
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    do_stable_layer_norm: bool = True  # pre-norm ("stable") variant

    # conv feature extractor (~49 frames/s; reference contract
    # train/train_phoneme_recognizer.py:161-164)
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "layer" (large) | "group" (base)

    # convolutional relative positional embedding
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16

    # dropout / regularization
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.1
    final_dropout: float = 0.1  # PR head dropout (w2v2_pr.py:35)
    layerdrop: float = 0.0  # disabled: layer-drop breaks pjit static structure

    # SpecAugment-style masking (active in HF during model.train(); the
    # reference therefore trains with it implicitly)
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    mask_feature_min_masks: int = 0

    # CTC head (reference train/train_phoneme_recognizer.py:339-344)
    vocab_size: int = 46
    blank_id: int = 0
    ctc_loss_reduction: str = "mean"
    ctc_zero_infinity: bool = True

    # numerics
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    # GELU evaluation: "auto" uses the hardware-tanh approximation when the
    # compute dtype is bfloat16 and the exact erf form in float32.
    # Rationale (measured, benchmarks/PERF.md round 3): the erf polynomial
    # costs ~1.1 ms/layer of pure VPU time at the inference shape — 26.8 ms
    # over the 24-layer stack — while tanh is a hardware transcendental
    # (~0.09 ms/layer); the approximation's ≤3e-3 deviation sits at the
    # bf16 activation-rounding scale, so on the bf16 path it is numerically
    # free (quality-tested in tests/test_models.py).  Float32 (the parity/
    # conversion-fidelity path) keeps exact erf.  Override with "exact" /
    # "tanh".
    gelu: str = "auto"
    # training-time gradient checkpointing granularity (models/wav2vec2.py):
    # "none" (no remat — fastest; the blessed training shapes fit HBM with
    # room to spare: 74.6 vs 80.1 ms/step, benchmarks/PERF.md round 2),
    # "full" (per-layer remat, minimum memory — the reference's always-on
    # gradient checkpointing, w2v2_pr.py:33; use for big-batch/long-bucket
    # runs), "dots" (save MXU outputs only; measured slower than both at
    # the blessed shape).  Inference is unaffected.
    remat_policy: str = "none"
    # attention activation layout: "bhtd" projects straight into the flash
    # kernel's (B, H, T, D) layout (einsum projections, identical params) —
    # no per-layer relayout; "bthd" is the classic (B, T, H, D) path.
    attention_layout: str = "bhtd"
    fused_qkv: bool = False  # single QKV GEMM (param tree changes; see
    #                          hf_convert.convert_wav2vec2_encoder(fused_qkv=))
    # INFERENCE-ONLY dynamic int8 quantization of the encoder GEMMs
    # (ops/quant.py).  This chip's MXU runs int8 at ~1.6× its bf16 rate at
    # the encoder shapes and the win survives on-the-fly quantization
    # overhead (benchmarks/int8_gemm_probe.py).  "w8a8_ffn" quantizes the
    # two FFN GEMMs (the bulk of the win, most conservative numerically);
    # "w8a8" additionally quantizes the four attention projections.
    # Output-changing approximation — default OFF; deviation bounds pinned
    # in tests/test_quant.py.  jnp.round has zero gradient: do not train
    # with this on (trainers keep "none").
    quant: str = "none"  # "none" | "w8a8_ffn" | "w8a8"
    # Megatron-style SEQUENCE PARALLELISM (new multi-chip scope, composing
    # with the tensor-parallel parameter rules in parallel/mesh.py): mesh
    # axis names constraining the (B, T, C) residual stream at the sublayer
    # boundaries, e.g. ("data", "model", None) shards the time axis over
    # the tensor-parallel axis so the LayerNorm/dropout/residual work — and
    # the replicated activation memory — split model-parallel-ways, and
    # XLA's SPMD partitioner realizes each sublayer's all-reduce as
    # reduce-scatter + all-gather.  Requires tracing under the target Mesh
    # context (`with mesh:`); the default None leaves activation placement
    # to the partitioner.  Ignored by the shard_map pipeline executor
    # (parallel/pipeline.py runs in manual-mesh mode where automatic
    # sharding constraints do not apply).
    activation_partition: Optional[Tuple[Optional[str], Optional[str],
                                         Optional[str]]] = None
    fused_feature_extractor: bool = False  # Pallas conv+LN+GELU kernel
    #   (ops/fused_conv.py): correct on TPU, double-buffered (two static
    #   scratch slots), but still measures ~8% slower end-to-end than XLA's
    #   conv lowering at these shapes (benchmarks/PERF.md round 2) — off.

    def with_ten_ms(self) -> "Wav2Vec2Config":
        """10 ms frame-rate variant: final conv stride 2 → 1
        (reference train/train_phoneme_recognizer.py:345-346)."""
        return dataclasses.replace(
            self, conv_stride=self.conv_stride[:-1] + (1,)
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def feat_extract_output_lengths(self, input_lengths):
        """Conv-stack output length: floor((L - k) / s) + 1 per layer
        (HF ``_get_feat_extract_output_lengths`` semantics used at
        reference models/w2v2_pr.py:57)."""
        lengths = input_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            lengths = (lengths - k) // s + 1
        return lengths


def tiny_config(**overrides) -> Wav2Vec2Config:
    """A small config for tests: same topology, tiny dims."""
    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16,) * 3,
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        vocab_size=11,
    )
    base.update(overrides)
    return Wav2Vec2Config(**base)
