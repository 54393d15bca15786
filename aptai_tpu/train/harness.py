"""Mesh-sharded training engine shared by all three workloads.

One compiled train step serves PR / APTAI / FORCE-APTAI: the caller supplies
a ``loss_fn(params, batch, rngs) -> (loss, aux)`` adapter for its model, and
the engine provides:

  * torch-parity Adam (L2-style ``weight_decay`` folded into the gradient,
    like ``torch.optim.Adam`` — the reference's optimizer at
    train/train_phoneme_recognizer.py:360-366),
  * a per-call learning-rate scalar so the epoch-level LambdaLR schedule
    (train/schedule.py) drives it exactly like the reference,
  * ``jax.jit`` over a ``Mesh`` with parameter shardings from
    :mod:`aptai_tpu.parallel` (tensor parallel) and batch sharding over the
    data axis (data parallel) — XLA inserts the psum/all-gather collectives
    over ICI; there is no hand-written communication,
  * donated state for in-place buffer reuse on HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from aptai_tpu.parallel import param_shardings  # noqa: F401 (re-export)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def torch_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """``torch.optim.Adam`` semantics: L2 weight decay added to the gradient
    *before* the moment updates (not AdamW), LR applied externally."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*txs)


def create_train_state(params, optimizer: optax.GradientTransformation):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


LossFn = Callable[[Any, Dict[str, jnp.ndarray], Dict[str, jax.Array]],
                  tuple]


def make_train_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    rng_names: tuple = ("dropout", "specaugment"),
):
    """Build the jitted, mesh-sharded SGD step.

    Returns ``step_fn(state, batch, rng, lr) -> (state, metrics)`` where
    ``metrics`` is the aux dict from ``loss_fn`` plus ``loss``.
    """

    def step_fn(state: TrainState, batch, rng, lr):
        rngs = dict(zip(rng_names, jax.random.split(
            jax.random.fold_in(rng, state.step), len(rng_names)
        )))

        def scalar_loss(params):
            loss, aux = loss_fn(params, batch, rngs)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(scalar_loss, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    # Mesh mode: shardings follow the inputs — the caller places the state
    # with parallel.shard_tree (params + optimizer moments sharded by the
    # Megatron-style path rules) and batches with parallel.shard_batch
    # (leading dim over the data axis); XLA then derives every collective
    # (psum for DP gradients, all-gather/reduce-scatter for TP matmuls).
    return jax.jit(step_fn, donate_argnums=(0,))
