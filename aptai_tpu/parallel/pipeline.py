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

Two schedules share the machinery:

  * ``interleave=1`` (default) — the straightforward GPipe fill/drain
    schedule: bubble fraction ``(S−1)/(M+S−1)``, driven down by more
    microbatches;
  * ``interleave=V>1`` — the Megatron-style interleaved (circular)
    schedule: each device holds ``V`` layer *chunks* at stride ``S``
    (device ``s`` owns global chunks ``v·S+s``), microbatches run in
    groups of ``S`` and cycle through the chunks over a RING ppermute
    (the extra wraparound edge ``S−1 → 0``).  Per-tick work is ``1/V``
    of a GPipe tick and the tick count is ``V·M + S − 1``, so the bubble
    fraction shrinks ``V×`` to ``(S−1)/(V·M+S−1)`` at the cost of ``V×``
    as many (smaller) ICI transfers.  The grouped microbatch order makes
    the wraparound message arrive exactly at the tick stage 0 consumes
    it, so no in-flight buffering queue is needed — the single ``buf``
    register of the GPipe loop carries both schedules.

Both are numerically the sequential layer loop (tests/test_pipeline.py
pins forward + gradient parity on the virtual mesh); the choice is purely
a bubble/communication trade measured in benchmarks/pp_schedule_ab.py.

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


def interleaved_layer_order(n_layers: int, n_stages: int, interleave: int):
    """Stacking permutation for the interleaved schedule.

    Returns original-layer indices ordered so that a contiguous
    ``P("pipe")`` shard of the restacked tree gives device ``s`` exactly
    its virtual chunks ``[v·S+s for v in range(V)]``, each of
    ``n_layers/(S·V)`` consecutive layers, concatenated in ``v`` order.
    """
    csz, rem = divmod(n_layers, n_stages * interleave)
    if rem:
        raise ValueError(
            f"{n_layers} layers not divisible into {n_stages} stages x "
            f"{interleave} chunks")
    order = []
    for s in range(n_stages):
        for v in range(interleave):
            chunk = v * n_stages + s
            order.extend(range(chunk * csz, (chunk + 1) * csz))
    return order


def schedule_ticks(num_microbatches: int, n_stages: int,
                   interleave: int = 1) -> int:
    """Static tick count of the pipeline loop: ``V·M + S − 1``.

    Per-device executed work is ``ticks / V`` full-stage units (useful
    work ``M``), so the bubble fraction is ``(S−1)/(V·M+S−1)`` — the
    interleaved schedule divides GPipe's bubble by ``V``.
    """
    return interleave * num_microbatches + n_stages - 1


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
    interleave: int = 1,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run the transformer layer stack as a pipeline over ``axis``.

    ``interleave=1`` is the GPipe schedule; ``interleave=V>1`` the
    circular/interleaved schedule (module docstring) — it requires
    ``stacked_params`` already restacked in :func:`interleaved_layer_order`
    (``pipelined_encoder_apply`` does this) and ``M`` a multiple of ``S``.

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
    if n_stages == 1:
        interleave = 1  # circular schedule is meaningless on one stage
    v_chunks = interleave
    if n_layers % (n_stages * v_chunks):
        raise ValueError(f"{n_layers} layers not divisible into "
                         f"{n_stages} stages x {v_chunks} chunks")
    b = h.shape[0]
    m = num_microbatches if num_microbatches is not None else n_stages
    if b % m:
        raise ValueError(f"batch {b} not divisible into {m} microbatches")
    if v_chunks > 1 and m % n_stages:
        # the grouped order needs whole groups of S microbatches so the
        # ring wraparound lands exactly on stage 0's consuming tick
        raise ValueError(f"interleave={v_chunks} needs microbatches ({m}) "
                         f"divisible by stages ({n_stages})")
    mb = b // m

    layer_module = EncoderLayer(cfg)
    local_layers = n_layers // n_stages
    csz = local_layers // v_chunks

    def _apply_layers(chunk_params, x, lens):
        """Apply a stacked slice of layers in sequence."""

        def body(carry, lp):
            out = layer_module.apply({"params": lp}, carry, lens, True)
            return out, None

        x, _ = jax.lax.scan(body, x, chunk_params)
        return x

    def _pipe(local_params, h_mb, lens_mb):
        # h_mb: (M, mb_local, T, C); lens_mb: (M, mb_local)
        sid = jax.lax.axis_index(axis)
        buf = jnp.zeros_like(h_mb[0])
        outs = jnp.zeros_like(h_mb)
        if n_stages > 1:
            perm = [(i, i + 1) for i in range(n_stages - 1)]
            if v_chunks > 1:
                perm.append((n_stages - 1, 0))  # chunk wraparound ring
        for t in range(schedule_ticks(m, n_stages, v_chunks)):
            if v_chunks == 1:
                # GPipe: stage s works on microbatch (t - s) at tick t
                j = jnp.clip(t - sid, 0, m - 1)
                x_src = h_mb[min(t, m - 1)]
                # the last stage finishes microbatch t-(S-1) at tick t
                write = (sid == n_stages - 1) & (t >= n_stages - 1)
                chunk_params = local_params
            else:
                # interleaved: grouped order — stage s at tick t runs
                # chunk v of microbatch g*S+jj where r = t-s decomposes
                # as r = g*(V*S) + v*S + jj
                r = jnp.clip(t - sid, 0, v_chunks * m - 1)
                g = r // (v_chunks * n_stages)
                w = r % (v_chunks * n_stages)
                v = w // n_stages
                j = g * n_stages + w % n_stages
                x_src = jnp.where(
                    v == 0,
                    jax.lax.dynamic_index_in_dim(h_mb, j, 0, False),
                    buf,  # wraparound from stage S-1 (previous chunk)
                )
                write = ((sid == n_stages - 1) & (v == v_chunks - 1)
                         & (t - sid >= 0) & (t - sid < v_chunks * m))
                chunk_params = jax.tree.map(
                    lambda p: jax.lax.dynamic_slice_in_dim(
                        p, v * csz, csz, 0),
                    local_params)
            # stage 0 consumes x_src (for V>1, x_src itself selects the
            # ring wraparound when v > 0); stages > 0 consume the ring
            x = jnp.where(sid == 0, x_src, buf)
            out = _apply_layers(
                chunk_params, x,
                jax.lax.dynamic_index_in_dim(lens_mb, j, 0, False))
            upd = jax.lax.dynamic_update_index_in_dim(outs, out, j, 0)
            outs = jnp.where(write, upd, outs)
            if n_stages > 1:
                buf = jax.lax.ppermute(out, axis, perm)
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
    interleave: int = 1,
    axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
):
    """Full ``Wav2Vec2Encoder`` forward with the layer stack pipelined.

    Prologue/epilogue run as plain SPMD ops from the SAME parameter tree;
    only the ``layers_*`` subtrees are restacked (in
    :func:`interleaved_layer_order` when ``interleave > 1``) and fed to
    the schedule.  Returns ``(hidden, frame_lengths, extract_features)``
    exactly like ``encoder.apply`` — and is differentiable w.r.t.
    ``variables``.
    """
    stacked, _ = split_layer_params(variables["params"])

    n_stages = mesh.shape[axis]
    if interleave > 1 and n_stages > 1:
        n_layers = jax.tree.leaves(stacked)[0].shape[0]
        order = jnp.asarray(
            interleaved_layer_order(n_layers, n_stages, interleave))
        stacked = jax.tree.map(lambda x: x[order], stacked)

    def stack_fn(h, frame_lengths):
        return pipeline_layer_stack(
            encoder.cfg, stacked, h, frame_lengths, mesh,
            num_microbatches=num_microbatches, interleave=interleave,
            axis=axis, data_axis=data_axis,
        )

    return encoder.apply(
        variables, audio, audio_lengths, deterministic=True,
        layer_stack_fn=stack_fn,
    )
