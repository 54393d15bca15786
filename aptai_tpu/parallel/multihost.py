"""Multi-process (multi-host) SPMD wiring.

The reference is strictly single-process (SURVEY.md §2.3); multi-host
scale-out is new first-class scope, done the JAX way: every process runs
the SAME program, ``jax.distributed.initialize`` connects them through a
coordinator, and from then on ``jax.devices()`` is the GLOBAL device list —
one ``Mesh`` spans all hosts, ``jit`` partitions over it, and XLA routes
collectives over ICI within a host/pod slice and DCN across.  Nothing else
in the framework changes: ``shard_batch`` already assembles global batches
from per-process row shards (``jax.make_array_from_process_local_data``)
and ``BucketedLoader(process_index=...)`` already deals each process its
disjoint rows.

Wire format of a launch (one command per host):

    aptai-train-pr ... --coordinator_address host0:9955 \
        --num_processes 2 --process_id $RANK

On Cloud TPU pods, ``jax.distributed.initialize()`` autodetects all three
from the TPU metadata server — pass ``--coordinator_address auto`` for
that path.  Proven in-repo by a real 2-process CPU run (Gloo collectives):
``tests/test_multihost.py`` asserts a data-parallel train step across two
processes matches the single-process step bit-for-bit on the loss.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def init_distributed(coordinator_address: str = "",
                     num_processes: int = 0,
                     process_id: int = -1,
                     local_device_ids: Optional[Sequence[int]] = None) -> bool:
    """Connect this process to a multi-process JAX run.

    Must run BEFORE any JAX backend is initialized (first ``jax.devices()``
    call).  Returns True when distributed mode was initialized, False when
    the arguments say single-process (``coordinator_address`` empty).

    ``local_device_ids`` optionally pins which local devices this process
    owns (JAX's ``local_device_ids`` — device IDs, not a count); leave
    ``None`` to let each process claim every device it can see.

    ``coordinator_address="auto"`` delegates every argument to JAX's
    environment autodetection (TPU pod metadata / cluster env vars).
    """
    if not coordinator_address:
        return False
    if coordinator_address == "auto":
        jax.distributed.initialize()
        return True
    if num_processes <= 0 or process_id < 0:
        raise ValueError(
            "multi-process launch needs --num_processes >= 1 and "
            f"--process_id >= 0 (got {num_processes}, {process_id})")
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def is_primary() -> bool:
    """True on the process that owns host-side writes (checkpoints, logs,
    CSVs).  Single-process runs are always primary."""
    return jax.process_index() == 0


def process_env_defaults() -> dict:
    """Best-effort launcher-env defaults (SLURM/OpenMPI style) for the
    ``--process_id`` / ``--num_processes`` flags, so
    ``srun aptai-train-pr --coordinator_address host0:9955`` works without
    repeating the rank plumbing."""
    out = {}
    for k in ("SLURM_PROCID", "OMPI_COMM_WORLD_RANK", "RANK"):
        if k in os.environ:
            out["process_id"] = int(os.environ[k])
            break
    for k in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "WORLD_SIZE"):
        if k in os.environ:
            out["num_processes"] = int(os.environ[k])
            break
    return out
