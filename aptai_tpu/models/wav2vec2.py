"""Flax wav2vec2-style acoustic encoder (TPU-native rebuild).

Replaces the HF/PyTorch ``Wav2Vec2Model`` backbone the reference loads at
models/w2v2_pr.py:28-33 and models/aptai.py:33-38.  Architecture parity with
the "large / stable-layer-norm" family (wav2vec2-large-robust, XLSR-53):

  raw wave (B, L)
    → 7-layer conv feature extractor, each conv + LayerNorm + exact GELU
      (512 ch, strides 5·2⁶ ⇒ 20 ms frames)
    → feature projection (LayerNorm → Dense(1024) → dropout)
    → [train only] SpecAugment-style time/feature masking with a learned
      mask embedding
    → grouped-conv relative positional embedding (k=128, 16 groups,
      weight-normalized) added residually
    → 24 pre-norm transformer layers (16-head MHA via the Pallas flash
      kernel, 4096 FFN, exact GELU)
    → final LayerNorm

TPU-first choices:
  * everything is static-shape; padding is carried as explicit lengths and
    applied as masks (the correct form of the reference's lengths-as-mask
    quirk, models/w2v2_pr.py:49 — see SURVEY.md §2.5);
  * gradient checkpointing = ``jax.checkpoint`` over each encoder layer
    (the reference enables torch gradient checkpointing, w2v2_pr.py:33);
  * compute dtype is configurable (bf16 for the MXU, f32 params).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from aptai_tpu.models.configs import Wav2Vec2Config
from aptai_tpu.ops.quant import (w8a8_head_proj, w8a8_matmul,
                                 w8a8_out_proj)
from aptai_tpu.ops.attention import (multi_head_attention,
                                     multi_head_attention_bhtd)


def _gelu(x, cfg: Optional[Wav2Vec2Config] = None):
    """GELU per the config's ``gelu`` mode (see configs.py): exact erf — the
    HF 'gelu' act — in f32/parity mode; the hardware-tanh approximation on
    the bf16 path, where its ≤3e-3 deviation is below activation rounding
    and the erf polynomial's VPU cost is the single largest non-GEMM term
    in the encoder (measured: 26.8 ms/24-layer stack at the inference
    shape — benchmarks/PERF.md round 3)."""
    mode = getattr(cfg, "gelu", "exact") if cfg is not None else "exact"
    if mode == "auto":
        mode = "tanh" if cfg.dtype == "bfloat16" else "exact"
    return jax.nn.gelu(x, approximate=(mode == "tanh"))


def _compute_dtype(cfg: Wav2Vec2Config):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _constrain_seq(x, cfg: Wav2Vec2Config):
    """Sequence-parallel activation sharding (``cfg.activation_partition``):
    constrain the (B, T, C) residual stream at the sublayer boundaries so
    the elementwise/LN work between the Megatron-sharded matmuls — and the
    activations themselves — shard over the named axes (see configs.py)."""
    if cfg.activation_partition is None:
        return x
    from jax.sharding import PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, PartitionSpec(*cfg.activation_partition))


class Conv1dGEMM(nn.Module):
    """Valid-padding strided Conv1d expressed as patches + one GEMM.

    Parameter layout is identical to ``nn.Conv`` (kernel ``(k, Cin, Cout)``,
    bias ``(Cout,)``) so HF conversion is unaffected.  On TPU the explicit
    im2col + matmul formulation keeps the feature extractor on the MXU with
    a clean (B·T, k·Cin)×(k·Cin, Cout) contraction instead of relying on
    XLA's conv lowering for long 1-D inputs.
    """

    features: int
    kernel: int
    stride: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, L, Cin)
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        t_out = (x.shape[1] - self.kernel) // self.stride + 1
        cols = [
            jax.lax.slice_in_dim(
                x, j, j + (t_out - 1) * self.stride + 1, self.stride, axis=1
            )
            for j in range(self.kernel)
        ]
        patches = jnp.concatenate(cols, axis=-1).astype(self.dtype)
        w = kernel.reshape(self.kernel * cin, self.features).astype(self.dtype)
        out = jax.lax.dot_general(
            patches, w, (((2,), (0,)), ((), ())),
            preferred_element_type=self.dtype,
        )
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's tree layout (kernel (k, Cin, Cout))."""

    features: int
    kernel: int
    use_bias: bool

    @nn.compact
    def __call__(self, c_in: int):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.kernel, c_in, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kern, bias


class _LNParams(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


def _fused_fe_applicable(cfg: Wav2Vec2Config, kernel: int, stride: int,
                         c_in: int) -> bool:
    """The fused Pallas conv+LN+GELU covers the homogeneous mid-stack
    layers on TPU (wide channels, small kernel, stride 2)."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    return (
        on_tpu
        and cfg.fused_feature_extractor
        and cfg.feat_extract_norm == "layer"
        and kernel in (2, 3)
        and stride == 2
        and c_in % 128 == 0
    )


class ConvLayerBlock(nn.Module):
    """One feature-extractor conv: Conv1d → (channel) LayerNorm → GELU.

    On TPU the homogeneous mid-stack layers run as one fused Pallas kernel
    (ops/fused_conv.py); elsewhere, and for the first (k=10, s=5, C_in=1)
    layer, the XLA conv + LayerNorm + GELU path is used — identical
    parameters either way.
    """

    cfg: Wav2Vec2Config
    features: int
    kernel: int
    stride: int

    use_patches_gemm: bool = False  # XLA's conv lowering benches faster here

    @nn.compact
    def __call__(self, x):
        dtype = _compute_dtype(self.cfg)
        if _fused_fe_applicable(self.cfg, self.kernel, self.stride,
                                x.shape[-1]):
            from aptai_tpu.ops.fused_conv import fused_conv_ln_gelu

            kern, bias = _ConvParams(
                self.features, self.kernel, self.cfg.conv_bias, name="conv"
            )(x.shape[-1])
            ls, lb = _LNParams(self.features, name="layer_norm")()
            return fused_conv_ln_gelu(
                x.astype(dtype), kern.astype(dtype),
                None if bias is None else bias.astype(dtype),
                ls, lb, self.stride, eps=self.cfg.layer_norm_eps,
            )
        if self.use_patches_gemm:
            conv = Conv1dGEMM(
                features=self.features,
                kernel=self.kernel,
                stride=self.stride,
                use_bias=self.cfg.conv_bias,
                dtype=dtype,
                name="conv",
            )
        else:
            conv = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel,),
                strides=(self.stride,),
                padding="VALID",
                use_bias=self.cfg.conv_bias,
                dtype=dtype,
                name="conv",
            )
        x = conv(x)
        if self.cfg.feat_extract_norm == "layer":
            x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=dtype,
                             name="layer_norm")(x)
        return _gelu(x, self.cfg)


class FeatureExtractor(nn.Module):
    """Strided conv stack over the raw waveform → (B, T_frames, conv_dim[-1])."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        # (B, L) -> (B, L, 1)
        h = x[:, :, None].astype(_compute_dtype(self.cfg))
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            h = ConvLayerBlock(self.cfg, dim, k, s, name=f"layers_{i}")(h)
        return h


class FeatureProjection(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, deterministic: bool):
        dtype = _compute_dtype(self.cfg)
        norm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, dtype=dtype,
                            name="layer_norm")(x)
        h = nn.Dense(self.cfg.hidden_size, dtype=dtype, name="projection")(norm)
        h = nn.Dropout(self.cfg.feat_proj_dropout)(h, deterministic=deterministic)
        return h


class PositionalConvEmbedding(nn.Module):
    """Grouped, weight-normalized conv positional embedding (k=128, g=16).

    Weight norm is kept in (g, v) parameterization so converted HF
    checkpoints stay bit-faithful; the composed kernel is
    ``g · v / ‖v‖`` with the norm over (in, out) per tap (torch dim=2).
    """

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        dtype = _compute_dtype(self.cfg)
        k = self.cfg.num_conv_pos_embeddings
        groups = self.cfg.num_conv_pos_embedding_groups
        hidden = self.cfg.hidden_size
        in_per_group = hidden // groups

        v = self.param(
            "weight_v",
            nn.initializers.normal(stddev=4.0 / np.sqrt(k * hidden)),
            (k, in_per_group, hidden),
            jnp.float32,
        )
        g = self.param("weight_g", nn.initializers.ones, (k, 1, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (hidden,), jnp.float32)

        norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True) + 1e-12)
        kernel = (g * v / norm).astype(dtype)

        t = x.shape[1]
        pad = k // 2
        h = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            feature_group_count=groups,
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        h = h + bias.astype(dtype)
        # HF SamePadLayer: drop the trailing element for even kernels
        if k % 2 == 0:
            h = h[:, :t]
        return _gelu(h, self.cfg)


class QuantDense(nn.Module):
    """``nn.Dense`` twin running its GEMM in dynamic W8A8 int8
    (ops/quant.py; inference-only — see ``Wav2Vec2Config.quant``).
    Parameter tree, shapes, and init are identical to ``nn.Dense``, so
    checkpoints and HF conversion are unaffected."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = w8a8_matmul(x, kernel, out_dtype=self.dtype)
        return y + bias.astype(self.dtype)


class HeadProjBHTD(nn.Module):
    """Linear projection straight into the kernel layout (B, H, T, D).

    Parameter tree is identical to ``nn.Dense`` (kernel (C, C), bias (C,)),
    so HF conversion and checkpoints are unaffected — only the einsum output
    layout differs, letting XLA write the attention kernel's native layout
    instead of materializing a (B, T, H, D) → (B·H, T, D) relayout per
    projection (benchmarks/PERF.md round-1 open item #1)."""

    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # dynamic W8A8 GEMM (inference-only)

    @nn.compact
    def __call__(self, x):  # (B, T, C) -> (B, H, T, D)
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c, self.hidden), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.hidden,),
                          jnp.float32)
        d = self.hidden // self.heads
        if self.quant:
            y = w8a8_head_proj(x, kernel.reshape(c, self.heads, d),
                               out_dtype=self.dtype)
        else:
            k = kernel.reshape(c, self.heads, d).astype(self.dtype)
            y = jnp.einsum("btc,chd->bhtd", x, k,
                           preferred_element_type=self.dtype)
        return y + bias.reshape(self.heads, d).astype(self.dtype)[
            None, :, None, :]


class OutProjBHTD(nn.Module):
    """Output projection consuming (B, H, T, D) directly (same param tree
    as ``nn.Dense`` on the flattened (B, T, C) context)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # dynamic W8A8 GEMM (inference-only)

    @nn.compact
    def __call__(self, ctx):  # (B, H, T, D) -> (B, T, C)
        _, h, _, d = ctx.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (h * d, self.hidden), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.hidden,),
                          jnp.float32)
        if self.quant:
            return w8a8_out_proj(ctx, kernel.reshape(h, d, self.hidden),
                                 out_dtype=self.dtype) + bias.astype(self.dtype)
        k = kernel.reshape(h, d, self.hidden).astype(self.dtype)
        return jnp.einsum("bhtd,hdc->btc", ctx, k,
                          preferred_element_type=self.dtype
                          ) + bias.astype(self.dtype)


class SelfAttention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        h_heads, d = cfg.num_attention_heads, cfg.head_dim
        b, t, _ = x.shape

        if cfg.attention_layout == "bhtd" and not cfg.fused_qkv:
            quant = cfg.quant == "w8a8"  # "w8a8_ffn" leaves projections exact

            def proj(name):
                return HeadProjBHTD(cfg.hidden_size, h_heads, dtype=dtype,
                                    quant=quant, name=name)

            q, k, v = (proj(n)(x) for n in ("q_proj", "k_proj", "v_proj"))
            ctx = multi_head_attention_bhtd(q, k, v, lengths)
            out = OutProjBHTD(cfg.hidden_size, dtype=dtype, quant=quant,
                              name="out_proj")(ctx)
            return nn.Dropout(cfg.attention_dropout)(
                out, deterministic=deterministic)

        if cfg.fused_qkv:
            qkv = nn.Dense(3 * cfg.hidden_size, dtype=dtype,
                           name="qkv_proj")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, t, h_heads, d)
            k = k.reshape(b, t, h_heads, d)
            v = v.reshape(b, t, h_heads, d)
        else:
            def proj(name):
                return nn.Dense(cfg.hidden_size, dtype=dtype, name=name)

            q = proj("q_proj")(x).reshape(b, t, h_heads, d)
            k = proj("k_proj")(x).reshape(b, t, h_heads, d)
            v = proj("v_proj")(x).reshape(b, t, h_heads, d)

        ctx = multi_head_attention(q, k, v, lengths)
        ctx = ctx.reshape(b, t, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=dtype, name="out_proj")(ctx)
        return nn.Dropout(cfg.attention_dropout)(out, deterministic=deterministic)


class FeedForward(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        dense = QuantDense if cfg.quant in ("w8a8", "w8a8_ffn") else nn.Dense
        h = dense(cfg.intermediate_size, dtype=dtype,
                  name="intermediate_dense")(x)
        h = _gelu(h, cfg)
        h = nn.Dropout(cfg.activation_dropout)(h, deterministic=deterministic)
        h = dense(cfg.hidden_size, dtype=dtype, name="output_dense")(h)
        return nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)


class EncoderLayer(nn.Module):
    """Pre-norm ("stable layer norm") transformer layer."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, lengths, deterministic: bool):
        cfg = self.cfg
        dtype = _compute_dtype(cfg)
        x = _constrain_seq(x, cfg)
        attn_in = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                               name="layer_norm")(x)
        x = x + SelfAttention(cfg, name="attention")(
            attn_in, lengths, deterministic
        )
        x = _constrain_seq(x, cfg)
        ff_in = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                             name="final_layer_norm")(x)
        x = x + FeedForward(cfg, name="feed_forward")(ff_in, deterministic)
        return x


def _compute_time_mask(rng, batch: int, t: int, lengths, prob: float,
                       span: int, min_masks: int):
    """SpecAugment span mask (True = masked), HF `_compute_mask_indices`-style:
    per item, ~prob·len/span random span starts within the valid region."""
    max_starts = max(int(prob * t / span) + 1, min_masks)
    rng_starts, rng_count = jax.random.split(rng)
    # number of spans per item ~ prob * len / span (stochastic rounding)
    expected = prob * lengths.astype(jnp.float32) / span
    frac = expected - jnp.floor(expected)
    extra = (jax.random.uniform(rng_count, (batch,)) < frac).astype(jnp.int32)
    n_spans = jnp.maximum(jnp.floor(expected).astype(jnp.int32) + extra,
                          min_masks)
    n_spans = jnp.minimum(n_spans, max_starts)
    starts = jax.random.uniform(rng_starts, (batch, max_starts))
    starts = (starts * jnp.maximum(lengths[:, None] - span, 1)).astype(jnp.int32)
    valid_span = jnp.arange(max_starts)[None, :] < n_spans[:, None]
    pos = jnp.arange(t)[None, None, :]
    in_span = (pos >= starts[:, :, None]) & (pos < starts[:, :, None] + span)
    return jnp.any(in_span & valid_span[:, :, None], axis=1)  # (B, T)


def _stack_pads_to_tiles(b: int, heads: int, t_tile: int, d: int) -> bool:
    """Whether the encoder pads the whole layer stack to the attention
    tile quantum: exactly when the flash kernel (which tiles in 128-frame
    blocks and would otherwise pad per layer) will take the dispatch —
    XLA's fused attention runs any T directly, so padding for it is pure
    extra GEMM work.  Module-level so tests can force the padded path on
    CPU (tests/test_models.py)."""
    from aptai_tpu.ops.attention import _use_flash

    return _use_flash(b, heads, t_tile, d)


class Wav2Vec2Encoder(nn.Module):
    """Full backbone: feature extractor → projection → transformer stack.

    ``__call__`` returns ``(hidden_states, frame_lengths, extract_features)``
    where ``hidden_states`` is the final LayerNorm output — the reference's
    ``hidden_states[24]`` / ``outputs[0]`` (models/aptai.py:81,
    models/w2v2_pr.py:53 — identical tensors in the stable-LN architecture).
    """

    cfg: Wav2Vec2Config
    freeze_feature_encoder: bool = False

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,          # (B, L) raw 16 kHz audio
        input_lengths: Optional[jnp.ndarray] = None,  # (B,)
        deterministic: bool = True,
        output_hidden_states: bool = False,
        layer_stack_fn=None,
        time_mask: Optional[jnp.ndarray] = None,
        precomputed_features: Optional[jnp.ndarray] = None,
    ):
        """``precomputed_features`` (optional): a ``(B, T_frames, conv_dim)``
        tensor REPLACING the conv feature-extractor forward — the hook for
        the frozen-FE training cache (train/fe_cache.py): when the FE is
        frozen (the reference's APTAI default, models/aptai.py:39-40) its
        output depends only on the audio, so re-running it every step is
        pure waste.  ``input_values`` may be None; ``input_lengths`` stays
        in AUDIO samples (frame lengths derive from it as usual).  Valid
        frames are bit-identical to the direct path (pad frames are zeroed
        before the pos-conv either way; tests/test_fe_cache.py).

        ``time_mask`` (optional): an externally computed ``(B, T_frames)``
        bool mask (True = masked) that REPLACES the internal SpecAugment
        time-mask sampling — masked steps get the learned mask embedding
        exactly as in training.  The self-supervised pretraining objective
        (models/pretrain.py) computes its span mask outside the model so
        the contrastive loss knows which positions were masked (the HF
        pretraining collator does the same); requires
        ``cfg.apply_spec_augment`` (the mask embedding's existence flag).

        ``layer_stack_fn`` (optional): a callable ``(h, frame_lengths) ->
        h`` that REPLACES the built-in transformer-layer loop — the hook the
        pipeline-parallel executor uses (parallel/pipeline.py) to run the
        24-layer stack as a GPipe schedule over a ``pipe`` mesh axis while
        the prologue (feature extractor → projection → pos-conv) and
        epilogue (final LayerNorm) stay ordinary SPMD ops.  The caller owns
        the layer parameters (stacked from this module's own tree); apply
        with the full parameter tree — unused ``layers_*`` subtrees are
        fine — but note ``init`` through this path would not create them."""
        cfg = self.cfg
        if precomputed_features is not None:
            if input_lengths is None:
                raise ValueError(
                    "precomputed_features needs input_lengths (audio "
                    "samples) for the frame masks")
            feats = precomputed_features.astype(_compute_dtype(cfg))
            b = feats.shape[0]
        else:
            b, l = input_values.shape
            if input_lengths is None:
                input_lengths = jnp.full((b,), l, jnp.int32)
            feats = FeatureExtractor(cfg, name="feature_extractor")(
                input_values)
        if self.freeze_feature_encoder:
            # reference default for APTAI (models/aptai.py:39-40) and the
            # optional PR flag (train_phoneme_recognizer.py:354-355)
            feats = jax.lax.stop_gradient(feats)

        frame_lengths = cfg.feat_extract_output_lengths(input_lengths)
        t = feats.shape[1]
        frame_mask = jnp.arange(t)[None, :] < frame_lengths[:, None]  # (B, T)

        extract_features = feats
        h = FeatureProjection(cfg, name="feature_projection")(
            feats, deterministic
        )

        # SpecAugment-style masking (training only), matching HF's
        # `_mask_hidden_states`: masked time steps are replaced by a learned
        # embedding.  Active in the reference implicitly via model.train().
        if cfg.apply_spec_augment:
            # parameter must exist regardless of train/eval so that one
            # param tree serves both modes
            mask_emb = self.param(
                "masked_spec_embed",
                nn.initializers.uniform(scale=1.0),
                (cfg.hidden_size,),
                jnp.float32,
            )
        if time_mask is not None:
            if not cfg.apply_spec_augment:
                raise ValueError(
                    "an external time_mask needs cfg.apply_spec_augment "
                    "(the learned mask embedding)")
            h = jnp.where((time_mask & frame_mask)[:, :, None],
                          mask_emb.astype(h.dtype), h)
        elif (cfg.apply_spec_augment and not deterministic
                and cfg.mask_time_prob > 0):
            rng = self.make_rng("specaugment")
            sampled_mask = _compute_time_mask(
                rng, b, t, frame_lengths, cfg.mask_time_prob,
                cfg.mask_time_length, cfg.mask_time_min_masks
            ) & frame_mask
            h = jnp.where(sampled_mask[:, :, None], mask_emb.astype(h.dtype), h)
        if (cfg.apply_spec_augment and not deterministic
                and cfg.mask_feature_prob > 0):
            # feature-dimension SpecAugment (HF `_mask_hidden_states`):
            # masked hidden channels are zeroed across every time step of
            # the item (span sampling reuses the time-mask machinery with
            # the channel axis as "time")
            c = h.shape[-1]
            feat_mask = _compute_time_mask(
                self.make_rng("specaugment"), b, c,
                jnp.full((b,), c, jnp.int32), cfg.mask_feature_prob,
                cfg.mask_feature_length, cfg.mask_feature_min_masks,
            )  # (B, C)
            h = jnp.where(feat_mask[:, None, :], jnp.zeros((), h.dtype), h)

        # zero padded frames (HF zeroes them before the conv pos-embedding)
        h = h * frame_mask[:, :, None].astype(h.dtype)

        h = h + PositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        # Pad the time axis ONCE to the attention tile quantum before the
        # layer loop (sliced back after) — but only on shapes that take
        # the Pallas flash path, which tiles in 128-frame blocks:
        # otherwise EVERY layer pads q/k/v to the tile size and slices
        # its output back (e.g. the 10 s shape runs T=499 → 512), and
        # those per-layer pad/slice copies break XLA's
        # projection/epilogue fusions — the composed 24-layer stack
        # measured 102.5 ms vs 83.9 ms isolated at T=512
        # (benchmarks/prologue_profile.py, an 18% stack tax).  Small
        # shapes dispatch to XLA's fused attention, which runs any T
        # directly — padding there is pure extra GEMM work (measured
        # −3% on the 8×5 s training shape).  Numerics are unchanged:
        # attention masks keys by frame_lengths with SELECT-based
        # masking, all other ops are frame-local, and pad rows stay
        # finite (LayerNorm renormalizes them; quant scales are
        # zero-guarded), so valid rows never see pad values.
        t_real = h.shape[1]
        t_tile = -(-t_real // 128) * 128  # attention _MIN_BLOCK quantum
        if (layer_stack_fn is None and t_tile != t_real
                and _stack_pads_to_tiles(
                    b, cfg.num_attention_heads, t_tile,
                    cfg.hidden_size // cfg.num_attention_heads)):
            h = jnp.pad(h, ((0, 0), (0, t_tile - t_real), (0, 0)))

        def _unpad(x):
            return x[:, :t_real] if x.shape[1] != t_real else x

        if layer_stack_fn is None:
            h = _constrain_seq(h, cfg)

        # gradient checkpointing over each layer in training, like the
        # reference's gradient_checkpointing_enable() (w2v2_pr.py:33);
        # deterministic (arg 3, counting self) is a static python bool.
        # cfg.remat_policy picks how much the backward recomputes:
        #   "full" — classic per-layer remat (save only layer inputs);
        #   "dots" — save every MXU (dot) output, recompute only cheap
        #            elementwise ops (jax dots_saveable policy);
        #   "none" — no remat, save all activations (fastest when HBM
        #            allows; the blessed training shapes fit easily).
        if deterministic or cfg.remat_policy == "none":
            layer = EncoderLayer
        elif cfg.remat_policy == "dots":
            layer = nn.remat(
                EncoderLayer, static_argnums=(3,),
                policy=jax.checkpoint_policies.dots_saveable,
            )
        else:
            layer = nn.remat(EncoderLayer, static_argnums=(3,))
        all_hidden = [_unpad(h)] if output_hidden_states else None
        if layer_stack_fn is not None:
            if output_hidden_states:
                raise ValueError(
                    "layer_stack_fn and output_hidden_states are exclusive: "
                    "an external stack executor returns only the final state"
                )
            h = layer_stack_fn(h, frame_lengths)
        else:
            for i in range(cfg.num_hidden_layers):
                h = layer(cfg, name=f"layers_{i}")(
                    h, frame_lengths, deterministic)
                if output_hidden_states and i < cfg.num_hidden_layers - 1:
                    all_hidden.append(_unpad(h))
        h = _unpad(h)

        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             dtype=_compute_dtype(cfg), name="layer_norm")(h)
        if output_hidden_states:
            # HF convention: entry 0 = projection output, entries 1..N-1 =
            # layer outputs, entry N = final (post-LayerNorm) hidden state —
            # so hidden_states[num_layers] == the encoder output, exactly
            # like the reference's hidden_states[24] (models/aptai.py:81)
            all_hidden.append(h)
            return h, frame_lengths, extract_features, all_hidden
        return h, frame_lengths, extract_features
