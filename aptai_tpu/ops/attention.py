"""Multi-head attention: XLA reference path + Pallas flash-attention kernel.

The encoder's attention replaces the HF/PyTorch SDPA used by the reference's
wav2vec2 backbone (reference models/w2v2_pr.py:28-33, models/aptai.py:33-38).
Design:

* :func:`multi_head_attention` is the public op.  Forward runs the Pallas
  flash kernel on TPU (online-softmax, O(T) memory, K/V resident in VMEM,
  never materializing the (T, T) matrix in HBM); on CPU or for odd shapes it
  falls back to a plain XLA einsum implementation.
* The backward pass (``jax.custom_vjp``) recomputes attention with XLA ops.
  At speech-encoder sequence lengths (≤ a few thousand 20 ms frames) the
  rematerialized (T, T) matrix fits comfortably, the MXU stays busy, and we
  keep exact gradients without a hand-written flash backward.
* Padding is handled with explicit per-sequence key lengths — the correct
  replacement for the reference's lengths-as-attention-mask quirk
  (reference models/w2v2_pr.py:49; see SURVEY.md §2.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_Q_BLOCK = 128
_K_BLOCK = 128


def _xla_attention(q, k, v, lengths):
    """Reference attention. q,k,v: (B, T, H, D); lengths: (B,) or None."""
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if lengths is not None:
        t_k = k.shape[1]
        mask = jnp.arange(t_k)[None, :] < lengths[:, None]  # (B, Tk)
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, t_padded,
                  group):
    """One (batch·head-group, q-block) tile of flash attention.

    A *group* of ``group`` batch·head slices is processed per grid cell via
    batched MXU matmuls — at speech-encoder sizes (T ≤ 512 ⇒ one q-block)
    the per-cell work would otherwise be far too small to amortize grid
    overheads.

    q_ref: (G, BQ, D); k_ref/v_ref: (G, T, D) in VMEM; len_ref: (B·H,)
    prefetched scalars in SMEM.
    """
    base = pl.program_id(0) * group

    q = q_ref[:].astype(jnp.float32) * scale         # (G, BQ, D)
    g_dim, bq, d = q.shape
    num_k_blocks = t_padded // _K_BLOCK

    # ``group`` divides the head count, so every slice in this cell belongs
    # to the same batch item ⇒ one scalar key length for the whole tile.
    length = len_ref[base]

    m0 = jnp.full((g_dim, bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g_dim, bq, 1), jnp.float32)
    acc0 = jnp.zeros((g_dim, bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[:, pl.ds(i * _K_BLOCK, _K_BLOCK), :].astype(jnp.float32)
        vb = v_ref[:, pl.ds(i * _K_BLOCK, _K_BLOCK), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, BQ, BK)
        col = i * _K_BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (g_dim, bq, _K_BLOCK), 2
        )
        s = jnp.where(col < length, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


def flash_attention(q, k, v, lengths=None):
    """Pallas flash attention. q,k,v: (B, T, H, D); lengths: (B,) int32.

    K/V stay in VMEM per grid cell; query tiles of up to 512 rows; 8
    batch·head slices batched per cell; online softmax per 128-key block
    (the (T, T) matrix never exists in HBM).
    """
    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    t_padded = _round_up(t, _K_BLOCK)
    # larger query tiles amortize per-grid-cell overhead at speech-encoder
    # sequence lengths (single q tile when T ≤ 512)
    q_block = min(t_padded, 512)
    t_padded = _round_up(t_padded, q_block)
    pad = t_padded - t

    bh = b * h
    # group must divide h so a grid cell never mixes batch items (single
    # scalar length per tile) — heads are contiguous in the (B*H) layout
    # group=4 at (512-query, 64-dim) tiles keeps the kernel inside the 16 MB
    # VMEM budget incl. double buffering; larger groups OOM the stack
    group = 1
    for cand in (4, 2):
        if h % cand == 0:
            group = cand
            break

    def to_bh(x):  # (B, T, H, D) -> (B*H, Tp, D)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(bh, t_padded, d)

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    lens_bh = jnp.repeat(lengths.astype(jnp.int32), h)  # (B*H,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // group, t_padded // q_block),
        in_specs=[
            pl.BlockSpec((group, q_block, d), lambda i, j, lens: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, t_padded, d), lambda i, j, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, t_padded, d), lambda i, j, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, q_block, d),
                               lambda i, j, lens: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, t_padded=t_padded,
                          group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t_padded, d), q.dtype),
    )(lens_bh, qf, kf, vf)

    out = out.reshape(b, h, t_padded, d).transpose(0, 2, 1, 3)
    return out[:, :t]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    try:
        # a jax.default_device(cpu) context (e.g. host-side param init of a
        # TPU model) must route to the XLA path — the Pallas kernel cannot
        # lower for CPU
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", None) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def multi_head_attention(q, k, v, lengths):
    """Length-masked scaled-dot-product MHA over (B, T, H, D) tensors.

    Flash (Pallas) forward on TPU, XLA elsewhere; XLA-recompute backward.
    ``lengths`` may be None for dense attention.
    """
    if _on_tpu() and q.shape[-1] <= 256:
        return flash_attention(q, k, v, lengths)
    return _xla_attention(q, k, v, lengths)


def _mha_fwd(q, k, v, lengths):
    return multi_head_attention(q, k, v, lengths), (q, k, v, lengths)


def _mha_bwd(res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, lengths),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


multi_head_attention.defvjp(_mha_fwd, _mha_bwd)
