"""Parameter-tree helpers (the reference's ``count_parameters`` analog,
utility.py:62-66, plus memory accounting)."""

from __future__ import annotations

import jax
import numpy as np


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def tree_bytes(tree) -> int:
    return sum(
        int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        for x in jax.tree.leaves(tree)
    )


def fetch_pytree(tree):
    """Device→host fetch of a whole pytree with ONE pipelined pass.

    ``jax.tree.map(np.asarray, tree)`` issues one *blocking* device→host
    round trip per leaf; a 315 M-param model is ~400 leaves, so on the
    tunnel (~30 ms RTT, ~40 MB/s) the serial fetch is minutes.  Starting
    every leaf's transfer first (``copy_to_host_async``) lets all leaves
    share the link in flight — the same trick as
    ``infer.api.fetch_outputs``, applied to arbitrary trees.  Host leaves
    (numpy arrays, python scalars) pass through unchanged.
    """
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass
    return jax.tree.map(np.asarray, tree)
