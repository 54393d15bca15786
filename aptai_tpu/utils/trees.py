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
