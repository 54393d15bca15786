"""Device-mesh construction and sharding rules.

The reference is single-process/single-GPU (SURVEY.md §2.3 — no distributed
code of any kind); parallel scale-out is first-class new scope here, done the
TPU way: a ``jax.sharding.Mesh`` with named axes, parameter/batch
``PartitionSpec`` rules, and ``jax.jit`` letting XLA insert the ICI
collectives.  The supported axes:

  * **dp** — data parallel (``mesh.py``: batch over ``data``, psum grads);
  * **fsdp/ZeRO-3** — params + optimizer moments additionally sharded over
    ``data`` (``shard_tree(fsdp=True)``; XLA inserts the all-gathers);
  * **tp** — Megatron tensor parallel over ``model`` (column/row-parallel
    matmul rules in ``_PARAM_RULES``);
  * **sp** — sequence-parallel activations between the tensor-parallel
    matmuls (``Wav2Vec2Config.activation_partition``; reduce-scatter +
    all-gather instead of all-reduce);
  * **pp** — pipeline over a ``pipe`` axis for the transformer layer
    stack (``pipeline.py``: shard_map + ppermute, differentiable; GPipe
    or the V×-lower-bubble interleaved/circular schedule);
  * **ep** — deliberately absent: the model family has no MoE layers
    (nothing in the reference to expert-shard; see pipeline.py docstring).
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
from aptai_tpu.parallel.multihost import (
    init_distributed,
    is_primary,
    process_env_defaults,
)
from aptai_tpu.parallel.pipeline import (
    PIPE_AXIS,
    interleaved_layer_order,
    pipeline_layer_stack,
    pipelined_encoder_apply,
    schedule_ticks,
    split_layer_params,
    stage_sharding,
    unstack_layer_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "init_distributed",
    "interleaved_layer_order",
    "is_primary",
    "make_mesh",
    "batch_sharding",
    "schedule_ticks",
    "param_shardings",
    "pipeline_layer_stack",
    "pipelined_encoder_apply",
    "process_env_defaults",
    "replicated",
    "shard_batch",
    "shard_tree",
    "split_layer_params",
    "stage_sharding",
    "unstack_layer_params",
]
