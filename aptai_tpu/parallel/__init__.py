"""Device-mesh construction and sharding rules (data + tensor parallel).

The reference is single-process/single-GPU (SURVEY.md §2.3 — no distributed
code of any kind); parallel scale-out is first-class new scope here, done the
TPU way: a ``jax.sharding.Mesh`` with named axes, parameter/batch
``PartitionSpec`` rules, and ``jax.jit`` letting XLA insert the ICI
collectives (psum for data-parallel gradients, all-gather/reduce-scatter for
the tensor-parallel matmuls).
"""

from aptai_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    param_shardings,
    replicated,
    shard_batch,
    shard_tree,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_tree",
]
