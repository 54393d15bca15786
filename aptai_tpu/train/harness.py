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

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

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


def trainable_mask(params, frozen_prefixes: Sequence[str]):
    """Bool pytree: True = trainable, False = frozen (no Adam moments, no
    weight decay — the analog of the reference's ``requires_grad=False``
    freeze of the PR tower, reference models/force_aptai.py:76-78)."""

    def mark(kp, _):
        top = str(getattr(kp[0], "key", getattr(kp[0], "idx", kp[0])))
        return top not in frozen_prefixes

    return jax.tree_util.tree_map_with_path(mark, params)


def torch_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    frozen_prefixes: Sequence[str] = (),
) -> optax.GradientTransformation:
    """``torch.optim.Adam`` semantics: L2 weight decay added to the gradient
    *before* the moment updates (not AdamW), LR applied externally.

    ``frozen_prefixes`` names top-level parameter subtrees excluded from the
    optimizer entirely (``optax.masked``): they carry no first/second-moment
    state on HBM and can never be weight-decayed.  Their gradients are zero
    by construction (``stop_gradient`` in the model) so the pass-through
    update leaves them bit-identical."""
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    tx = optax.chain(*txs)
    if frozen_prefixes:
        tx = optax.masked(
            tx, lambda params: trainable_mask(params, frozen_prefixes)
        )
    return tx


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
    grad_accum: int = 1,
):
    """Build the jitted, mesh-sharded SGD step.

    Returns ``step_fn(state, batch, rng, lr) -> (state, metrics)`` where
    ``metrics`` is the aux dict from ``loss_fn`` plus ``loss``.

    ``grad_accum=k`` splits each batch into ``k`` equal microbatches and
    runs them through a ``lax.scan`` that accumulates gradients before the
    single optimizer update — the TPU-native way to train at an effective
    batch the activations of which don't fit HBM (activation memory is one
    microbatch; the scan is one compiled program, no Python re-dispatch).
    All loss adapters reduce by per-batch mean, so the mean of ``k`` equal
    microbatch gradients IS the full-batch gradient: ``k=1`` and ``k>1``
    agree to numerical noise on deterministic losses
    (tests/test_parallel.py).  Microbatches are sliced along the leading
    axis with static offsets, so a data-parallel batch layout survives
    as long as ``batch/k`` still divides over the data axis.  Each
    microbatch folds its index into the step rng: dropout/SpecAugment
    masks stay independent across microbatches.
    """

    def _grads_one(params, batch, rngs):
        def scalar_loss(p):
            return loss_fn(p, batch, rngs)

        (loss, aux), grads = jax.value_and_grad(scalar_loss, has_aux=True)(
            params)
        return loss, aux, grads

    def step_fn(state: TrainState, batch, rng, lr):
        base = jax.random.fold_in(rng, state.step)

        if grad_accum == 1:
            rngs = dict(zip(rng_names,
                            jax.random.split(base, len(rng_names))))
            loss, aux, grads = _grads_one(state.params, batch, rngs)
        else:
            b = jax.tree.leaves(batch)[0].shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible into {grad_accum} "
                    "gradient-accumulation microbatches")
            mb = b // grad_accum

            def micro(carry, i):
                acc_g, acc_l, acc_aux = carry
                sub = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, i * mb, mb, 0), batch)
                r = jax.random.fold_in(base, i)
                rngs = dict(zip(rng_names,
                                jax.random.split(r, len(rng_names))))
                loss, aux, grads = _grads_one(state.params, sub, rngs)
                return (jax.tree.map(jnp.add, acc_g, grads),
                        acc_l + loss,
                        jax.tree.map(jnp.add, acc_aux, aux)), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            # probe aux structure with microbatch 0's rngs (abstract eval
            # only — cost-free under jit)
            aux0 = jax.eval_shape(
                lambda p: loss_fn(p, jax.tree.map(
                    lambda x: x[:mb], batch), dict(zip(
                        rng_names,
                        jax.random.split(base, len(rng_names))))),
                state.params)[1]
            zeros_aux = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), aux0)
            (grads, loss, aux), _ = jax.lax.scan(
                micro, (zeros_g, jnp.zeros((), jnp.float32), zeros_aux),
                jnp.arange(grad_accum))
            inv = 1.0 / grad_accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            aux = jax.tree.map(lambda a: a * inv, aux)

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


@dataclasses.dataclass
class Engine:
    """One compiled training engine, reusable across LOSO folds.

    The reference rebuilds model + optimizer per held-out speaker
    (train/train_aptai.py:872-996); on TPU a full-size compile costs
    minutes, so the jitted step/eval closures are built once and every
    fold reuses them (fresh params, same compiled program)."""

    optimizer: optax.GradientTransformation
    step_fn: Callable
    mesh: Optional[Mesh]


def make_engine(
    cfg,
    loss_fn: LossFn,
    mesh: Optional[Mesh] = None,
    frozen_prefixes: Sequence[str] = (),
) -> Engine:
    """Build optimizer + jitted train step once for a whole run."""
    if mesh is None:
        from aptai_tpu.parallel import make_mesh

        mesh = make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)
    optimizer = torch_adam(
        b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_epsilon,
        weight_decay=cfg.adam_weight_decay, frozen_prefixes=frozen_prefixes,
    )
    step = make_train_step(loss_fn, optimizer, mesh,
                           grad_accum=getattr(cfg, "grad_accum", 1))
    return Engine(optimizer, step, mesh)
