"""Pipeline parallelism (GPipe schedule) over the transformer layer stack.

The reference is strictly single-device (SURVEY.md §2.3), so — like tensor
and fully-sharded data parallelism in ``parallel/mesh.py`` — pipelining is
new first-class TPU scope, not a port.  The wav2vec2-large encoder's 24
identical pre-norm layers (models/wav2vec2.py) are the natural pipeline
body: each of ``S`` stages along a ``pipe`` mesh axis holds ``24/S``
layers' parameters, microbatches flow stage-to-stage over ICI via
``lax.ppermute`` (XLA collective-permute — the TPU-native point-to-point),
and everything outside the stack (feature extractor, projection, pos-conv,
final LayerNorm, task heads, losses) stays ordinary SPMD under the same
jit.

Design notes (TPU-first):
  * the schedule is expressed with ``shard_map`` so each device runs a
    *manual* single-program loop — the per-tick control flow is identical
    on every device (static trip count ``M + S − 1``), which is exactly
    what XLA wants: no data-dependent control flow, one compiled program;
  * layer parameters are STACKED on a leading axis (``stack_layer_params``)
    and sharded ``P("pipe")`` over it, so per-device parameter memory is
    ``1/S`` of the stack — the point of pipeline parallelism for models
    that outgrow one chip's HBM;
  * the whole schedule is differentiable (``ppermute``/``psum`` have exact
    transposes), so a pipelined *training* step is just ``jax.grad``
    through this function — no hand-written backward schedule;
  * composes with data parallelism: the per-microbatch batch dimension may
    be sharded over the ``data`` axis (``data_axis=``).

This is the straightforward GPipe fill/drain schedule: bubble fraction
``(S−1)/(M+S−1)``, driven down by more microbatches.  A 1F1B/interleaved
schedule is a throughput refinement, not a semantic change; the sharding
and collective structure — what multi-chip correctness depends on — is
fully exercised here (tests/test_pipeline.py runs it on the virtual mesh).

Expert parallelism has no target in this model family (no MoE layers in
the reference or the rebuild), so ``ep`` is deliberately absent rather
than stubbed.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from aptai_tpu.models.configs import Wav2Vec2Config

PIPE_AXIS = "pipe"

_LAYER_KEY = re.compile(r"^layers_(\d+)$")


def split_layer_params(encoder_params):
    """Split an encoder parameter tree into (stacked layer tree, rest).

    ``encoder_params`` is the ``Wav2Vec2Encoder`` subtree (keys
    ``feature_extractor``, ``feature_projection``, ``pos_conv_embed``,
    ``layers_0`` … ``layers_{N-1}``, ``layer_norm``, …).  The returned
    stacked tree has every leaf with a new leading axis of size N (layer
    index), suitable for ``P("pipe")`` sharding; ``rest`` is the original
    tree minus the ``layers_*`` entries.
    """
    layer_keys = sorted(
        (int(m.group(1)), k)
        for k in encoder_params
        if (m := _LAYER_KEY.match(k))
    )
    if not layer_keys:
        raise ValueError("no layers_<i> entries in the encoder param tree")
    indices = [i for i, _ in layer_keys]
    if indices != list(range(len(indices))):
        raise ValueError(f"non-contiguous layer indices: {indices}")
    per_layer = [encoder_params[k] for _, k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
    rest = {k: v for k, v in encoder_params.items()
            if not _LAYER_KEY.match(k)}
    return stacked, rest


def unstack_layer_params(stacked):
    """Inverse of :func:`split_layer_params`'s stacking: a dict
    ``layers_i -> tree`` (e.g. to merge a pipeline-trained stack back into
    a flat checkpoint tree)."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"layers_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(n)
    }


def stage_sharding(mesh: Mesh, stacked, axis: str = PIPE_AXIS):
    """NamedShardings placing a stacked layer tree ``P(axis)`` over its
    leading (layer) axis — each pipeline stage holds only its layers."""
    from jax.sharding import NamedSharding

    return jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), stacked)


def pipeline_layer_stack(
    cfg: Wav2Vec2Config,
    stacked_params,
    h: jnp.ndarray,                 # (B, T, C) projected hidden states
    frame_lengths: jnp.ndarray,     # (B,)
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run the transformer layer stack as a GPipe pipeline over ``axis``.

    Matches the sequential layer loop of ``Wav2Vec2Encoder.__call__``
    numerically (deterministic path — layer dropout keys are not threaded
    through the schedule; training regularization stays available through
    the prologue's SpecAugment and head dropout, and DP/TP/FSDP cover the
    dropout-in-stack training layouts).  Plug into the encoder via its
    ``layer_stack_fn`` hook.
    """
    import dataclasses

    from aptai_tpu.models.wav2vec2 import EncoderLayer

    if cfg.activation_partition is not None:
        # shard_map bodies run in manual-mesh mode — automatic sharding
        # constraints do not apply inside the schedule
        cfg = dataclasses.replace(cfg, activation_partition=None)

    n_stages = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible into "
                         f"{n_stages} stages")
    b = h.shape[0]
    m = num_microbatches if num_microbatches is not None else n_stages
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    mb = b // m

    layer_module = EncoderLayer(cfg)

    def _stage(local_params, x, lens):
        """Apply this stage's ``n_layers // n_stages`` layers in sequence."""

        def body(carry, lp):
            out = layer_module.apply({"params": lp}, carry, lens, True)
            return out, None

        x, _ = jax.lax.scan(body, x, local_params)
        return x

    def _pipe(local_params, h_mb, lens_mb):
        # h_mb: (M, mb_local, T, C); lens_mb: (M, mb_local)
        sid = jax.lax.axis_index(axis)
        buf = jnp.zeros_like(h_mb[0])
        outs = jnp.zeros_like(h_mb)
        for t in range(m + n_stages - 1):
            # stage s works on microbatch (t - s) at tick t
            mb_idx = jnp.clip(t - sid, 0, m - 1)
            x = jnp.where(sid == 0, h_mb[min(t, m - 1)], buf)
            out = _stage(local_params, x, lens_mb[mb_idx])
            # the last stage finishes microbatch (t - (S-1)) at tick t
            write = (sid == n_stages - 1) & (t >= n_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, out, jnp.clip(t - (n_stages - 1), 0, m - 1), 0)
            outs = jnp.where(write, upd, outs)
            if n_stages > 1:
                buf = jax.lax.ppermute(
                    out, axis, [(i, i + 1) for i in range(n_stages - 1)])
        # broadcast the finished microbatches from the last stage to all
        # pipeline ranks (psum of a one-stage-hot buffer)
        return jax.lax.psum(
            jnp.where(sid == n_stages - 1, outs, jnp.zeros_like(outs)), axis)

    t_frames, c = h.shape[1], h.shape[2]
    h_mb = h.reshape(m, mb, t_frames, c)
    lens_mb = frame_lengths.reshape(m, mb)

    mb_spec = P(None, data_axis, None, None)
    lens_spec = P(None, data_axis)
    params_spec = jax.tree.map(lambda _: P(axis), stacked_params)

    out_mb = shard_map(
        _pipe,
        mesh=mesh,
        in_specs=(params_spec, mb_spec, lens_spec),
        out_specs=mb_spec,
        check_vma=False,
    )(stacked_params, h_mb, lens_mb)
    return out_mb.reshape(b, t_frames, c)


def pipelined_encoder_apply(
    encoder,
    variables,
    audio: jnp.ndarray,
    audio_lengths: jnp.ndarray,
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
):
    """Full ``Wav2Vec2Encoder`` forward with the layer stack pipelined.

    Prologue/epilogue run as plain SPMD ops from the SAME parameter tree;
    only the ``layers_*`` subtrees are restacked and fed to the schedule.
    Returns ``(hidden, frame_lengths, extract_features)`` exactly like
    ``encoder.apply`` — and is differentiable w.r.t. ``variables``.
    """
    stacked, _ = split_layer_params(variables["params"])

    def stack_fn(h, frame_lengths):
        return pipeline_layer_stack(
            encoder.cfg, stacked, h, frame_lengths, mesh,
            num_microbatches=num_microbatches, axis=axis,
            data_axis=data_axis,
        )

    return encoder.apply(
        variables, audio, audio_lengths, deterministic=True,
        layer_stack_fn=stack_fn,
    )
