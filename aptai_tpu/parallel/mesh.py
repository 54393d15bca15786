"""Mesh + sharding rules for the APTAI model family.

Axes:
  * ``data``  — batch dimension (data parallel; gradients all-reduce over ICI)
  * ``model`` — tensor parallel: attention heads and FFN hidden dimension
    are sharded Megatron-style (column-parallel first matmul, row-parallel
    second matmul), so each layer needs exactly one all-reduce per sublayer,
    which XLA derives from the output shardings.

The wav2vec2-large encoder (~315 M params) fits on one chip, so tensor
parallelism is about latency scaling and headroom for bigger backbones; the
default production layout is pure data parallel (``model=1``).
"""

from __future__ import annotations

import re
import warnings
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh. ``data=-1`` → use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


# (regex over 'a/b/c' param path) -> PartitionSpec.  First match wins.
# NOTE: the fused_qkv layout keeps qkv_proj replicated (a naive output-dim
# split would cut across the q/k/v boundary); use unfused QKV with tensor
# parallelism.
_PARAM_RULES = (
    # attention: column-parallel QKV, row-parallel output projection
    (r".*attention/(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r".*attention/(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r".*attention/out_proj/kernel$", P(MODEL_AXIS, None)),
    # feed-forward: column-parallel up, row-parallel down
    (r".*feed_forward/intermediate_dense/kernel$", P(None, MODEL_AXIS)),
    (r".*feed_forward/intermediate_dense/bias$", P(MODEL_AXIS)),
    (r".*feed_forward/output_dense/kernel$", P(MODEL_AXIS, None)),
    # feature projection: column-parallel into the hidden dim is not worth a
    # collective at 512->1024; keep replicated.
)


def _spec_for_path(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


# Leaves smaller than this many elements stay replicated under FSDP: the
# per-use all-gather latency of a tiny bias outweighs its memory (the same
# floor production FSDP implementations apply).
FSDP_MIN_SIZE = 65_536


def _fsdp_augment(spec: P, x, n_data: int, min_size: int) -> P:
    """Additionally shard the largest not-yet-sharded divisible dimension of
    ``x`` over the data axis (ZeRO-3 parameter sharding composed with the
    tensor-parallel spec)."""
    ndim = getattr(x, "ndim", 0)
    if ndim == 0 or x.size < min_size:
        return spec
    axes = list(spec) + [None] * (ndim - len(spec))
    free = [i for i, a in enumerate(axes) if a is None
            and x.shape[i] % n_data == 0]
    if not free:
        return spec
    big = max(free, key=lambda i: x.shape[i])
    axes[big] = DATA_AXIS
    return P(*axes)


def param_shardings(mesh: Mesh, tree, fsdp: bool = False,
                    fsdp_min_size: int = FSDP_MIN_SIZE):
    """NamedShardings for a parameter-bearing pytree (params, or a whole
    train state — the rules match on path *suffixes*, so optimizer moments
    like ``.../mu/encoder/layers_0/attention/q_proj/kernel`` shard exactly
    like their parameters; scalars and unmatched leaves replicate).

    When the mesh has ``model == 1`` every spec degenerates to replicated,
    which XLA folds away — one rule set serves both layouts.

    ``fsdp=True`` additionally shards every large leaf over the *data* axis
    (largest free dimension; see :func:`_fsdp_augment`) — ZeRO-3-style
    fully-sharded data parallelism.  The train step is unchanged: with the
    state placed this way, XLA's SPMD partitioner inserts the all-gathers
    before each use and keeps gradients/moments/updates sharded, so
    per-device parameter + optimizer memory drops ~``data``-fold while the
    numerics stay those of plain DP (same loss; reduction order differs at
    float tolerance).
    """
    n_data = mesh.shape[DATA_AXIS]

    def to_sharding(kp, x):
        spec = _spec_for_path(_path_str(kp))
        if getattr(x, "ndim", 0) < len([a for a in spec if a is not None]):
            spec = P()
        if fsdp and n_data > 1:
            spec = _fsdp_augment(spec, x, n_data, fsdp_min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def shard_tree(mesh: Mesh, tree, fsdp: bool = False,
               fsdp_min_size: int = FSDP_MIN_SIZE):
    """``device_put`` a pytree according to :func:`param_shardings`."""
    return jax.device_put(
        tree, param_shardings(mesh, tree, fsdp=fsdp,
                              fsdp_min_size=fsdp_min_size))


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree with the leading dim sharded over ``data``.

    Falls back to replication when the batch size does not divide the data
    axis (small eval/debug batches) — correctness first, then speed.

    Multi-host: each process holds only its row shard (see
    ``BucketedLoader(process_count=...)``), so the global array is assembled
    from process-local data — DP then extends across hosts with XLA
    collectives over ICI/DCN exactly as on one host.
    """
    n_data = mesh.shape[DATA_AXIS]
    multihost = jax.process_count() > 1

    def put(x):
        if multihost and getattr(x, "ndim", 0) >= 1:
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(DATA_AXIS)), np.asarray(x)
            )
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
        if getattr(x, "ndim", 0) >= 1 and n_data > 1:
            # replication means every device runs the FULL batch — n_data×
            # redundant work; make that visible instead of silent
            warnings.warn(
                f"shard_batch: leading dim {x.shape[0]} does not divide the "
                f"data axis ({n_data}) — replicating (every device computes "
                "the whole batch); bucket batch sizes to a multiple of the "
                "data axis for real data parallelism",
                stacklevel=3,
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
