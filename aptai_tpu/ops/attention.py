"""Multi-head attention: XLA reference path + Pallas flash kernels.

The encoder's attention replaces the HF/PyTorch SDPA used by the reference's
wav2vec2 backbone (reference models/w2v2_pr.py:28-33, models/aptai.py:33-38).
Design:

* :func:`multi_head_attention` is the public op over the classic
  ``(B, T, H, D)`` activation layout; :func:`multi_head_attention_bhtd`
  takes ``(B, H, T, D)`` directly — the layout the kernel wants — so the
  model can project straight into it and skip the ~256 MB/layer host-side
  relayouts that round 1 paid (benchmarks/PERF.md open item #1).
* Forward is a Pallas flash kernel on TPU (online softmax, O(T) memory, K/V
  resident in VMEM, never materializing the (T, T) matrix in HBM); on CPU
  or for odd head dims it falls back to a plain XLA einsum implementation.
* Backward is a pair of Pallas flash kernels (dq; dk+dv) using the saved
  per-row logsumexp — O(T) memory end-to-end.  Round 1 rematerialized the
  full (B, H, T, T) matrix in f32 through XLA (VERDICT r1 weak #8); that
  path remains only as the CPU fallback.
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

_MIN_BLOCK = 128  # padding quantum (MXU tile alignment)
LSE_LANES = 8  # trailing broadcast lanes for per-row stats (tiling rule)


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


def _xla_attention_bhtd(q, k, v, lengths):
    """XLA fallback for the (B, H, T, D) layout."""
    to = lambda x: x.transpose(0, 2, 1, 3)
    return to(_xla_attention(to(q), to(k), to(v), lengths))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale,
                  t_padded, k_block, group, save_lse):
    """One (batch·head-group, q-block) tile of flash attention.

    A *group* of ``group`` batch·head slices is processed per grid cell via
    batched MXU matmuls — at speech-encoder sizes (T ≤ 512 ⇒ one q-block)
    the per-cell work would otherwise be far too small to amortize grid
    overheads.

    q_ref: (G, BQ, D); k_ref/v_ref: (G, T, D) in VMEM; len_ref: (B·H,)
    prefetched scalars in SMEM; lse_ref: (G, BQ) per-row logsumexp out
    (training only).
    """
    base = pl.program_id(0) * group

    # MXU dots run in the INPUT dtype (bf16 on the model path) with f32
    # accumulation: the activations are already bf16-rounded, so upcasting
    # them to f32 first gains no precision — it only halves MXU throughput.
    # f32 inputs (CPU parity tests) keep full-precision dots.
    q = q_ref[:]                                     # (G, BQ, D)
    in_dtype = q.dtype
    g_dim, bq, d = q.shape
    num_k_blocks = t_padded // k_block

    # ``group`` divides the head count, so every slice in this cell belongs
    # to the same batch item ⇒ one scalar key length for the whole tile.
    length = len_ref[base]

    m0 = jnp.full((g_dim, bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g_dim, bq, 1), jnp.float32)
    acc0 = jnp.zeros((g_dim, bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[:, pl.ds(i * k_block, k_block), :]
        vb = v_ref[:, pl.ds(i * k_block, k_block), :]
        s = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (G, BQ, BK) f32; scale applied post-dot in f32
        col = i * k_block + jax.lax.broadcasted_iota(
            jnp.int32, (g_dim, bq, k_block), 2
        )
        s = jnp.where(col < length, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(in_dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)
    if save_lse:
        # Mosaic block tiling requires the last two dims to be (8k, 128m) or
        # match the array — a (G, BQ) row vector can't tile, so the LSE is
        # stored broadcast over an 8-lane trailing dim (LSE_LANES)
        lse = m + jnp.log(jnp.where(l == 0, 1.0, l))   # (G, BQ, 1)
        lse_ref[:] = jnp.broadcast_to(lse, lse.shape[:2] + (LSE_LANES,))


def _fwd_call(qf, kf, vf, lens_bh, *, scale, t_padded, q_block, k_block,
              group, save_lse):
    """pallas_call wrapper over the (B·H, Tp, D) layout."""
    bh, _, d = qf.shape
    in_specs = [
        pl.BlockSpec((group, q_block, d), lambda i, j, lens: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, t_padded, d), lambda i, j, lens: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, t_padded, d), lambda i, j, lens: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((group, q_block, d), lambda i, j, lens: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, q_block, LSE_LANES),
                     lambda i, j, lens: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bh, t_padded, d), qf.dtype),
        jax.ShapeDtypeStruct((bh, t_padded, LSE_LANES), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // group, t_padded // q_block),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, t_padded=t_padded,
                          k_block=k_block, group=group, save_lse=save_lse),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(lens_bh, qf, kf, vf)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels (flash: saved logsumexp, O(T) memory)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, scale, t_padded, k_block,
                         group):
    """dq for one (group, q-block) tile: loop over key blocks.

    ds = p ⊙ (dO·Vᵀ − Δ);  dq = ds·K · scale  with p = exp(s − lse).
    """
    base = pl.program_id(0) * group
    length = len_ref[base]

    q = q_ref[:]                                      # (G, BQ, D)
    do = do_ref[:]                                    # (G, BQ, D)
    in_dtype = q.dtype
    # stats arrive broadcast over LSE_LANES; reduce back to (G, BQ, 1)
    lse = jnp.max(lse_ref[:], axis=-1, keepdims=True)
    delta = jnp.max(delta_ref[:], axis=-1, keepdims=True)
    g_dim, bq, d = q.shape
    num_k_blocks = t_padded // k_block

    def body(i, dq):
        kb = k_ref[:, pl.ds(i * k_block, k_block), :]
        vb = v_ref[:, pl.ds(i * k_block, k_block), :]
        s = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                     # (G, BQ, BK)
        col = i * k_block + jax.lax.broadcasted_iota(
            jnp.int32, (g_dim, bq, k_block), 2
        )
        p = jnp.where(col < length, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, vb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (G, BQ, BK)
        ds = (p * (dp - delta)).astype(in_dtype)
        return dq + jax.lax.dot_general(
            ds, kb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(
        0, num_k_blocks, body, jnp.zeros((g_dim, bq, d), jnp.float32)
    )
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, *, scale, t_padded,
                          q_step, group):
    """dk/dv for one (group, key-block) tile: loop over query blocks.

    dv = pᵀ·dO;  dk = dsᵀ·Q · scale.
    """
    base = pl.program_id(0) * group
    length = len_ref[base]

    kb = k_ref[:]                                     # (G, BK, D)
    vb = v_ref[:]                                     # (G, BK, D)
    in_dtype = kb.dtype
    g_dim, bk, d = kb.shape
    j = pl.program_id(1)
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, (g_dim, 1, bk), 2)
    col_valid = col < length                          # (G, 1, BK)
    num_q_blocks = t_padded // q_step

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[:, pl.ds(i * q_step, q_step), :]
        dob = do_ref[:, pl.ds(i * q_step, q_step), :]
        lse = jnp.max(lse_ref[:, pl.ds(i * q_step, q_step), :],
                      axis=-1, keepdims=True)
        delta = jnp.max(delta_ref[:, pl.ds(i * q_step, q_step), :],
                        axis=-1, keepdims=True)
        s = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                     # (G, BQ, BK)
        p = jnp.where(col_valid, jnp.exp(s - lse), 0.0)
        p_lo = p.astype(in_dtype)
        # dv += pᵀ · dO   (contract over the BQ dim)
        dv = dv + jax.lax.dot_general(
            p_lo, dob, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dob, vb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                             # (G, BQ, BK)
        ds = (p * (dp - delta)).astype(in_dtype)
        dk = dk + jax.lax.dot_general(
            ds, qb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((g_dim, bk, d), jnp.float32)
    dv0 = jnp.zeros((g_dim, bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q_blocks, body, (dk0, dv0))
    dk_ref[:] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _bwd_call(qf, kf, vf, dof, lse, delta, lens_bh, *, scale, t_padded,
              q_block, k_block, group):
    bh, _, d = qf.shape
    full = lambda: pl.BlockSpec((group, t_padded, d),
                                lambda i, j, lens: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    qblk = lambda: pl.BlockSpec((group, q_block, d),
                                lambda i, j, lens: (i, j, 0),
                                memory_space=pltpu.VMEM)
    row_qblk = lambda: pl.BlockSpec((group, q_block, LSE_LANES),
                                    lambda i, j, lens: (i, j, 0),
                                    memory_space=pltpu.VMEM)
    row_full = lambda: pl.BlockSpec((group, t_padded, LSE_LANES),
                                    lambda i, j, lens: (i, 0, 0),
                                    memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          t_padded=t_padded, k_block=k_block, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // group, t_padded // q_block),
            in_specs=[qblk(), full(), full(), qblk(), row_qblk(),
                      row_qblk()],
            out_specs=qblk(),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_padded, d), qf.dtype),
    )(lens_bh, qf, kf, vf, dof, lse, delta)

    kblk = lambda: pl.BlockSpec((group, k_block, d),
                                lambda i, j, lens: (i, j, 0),
                                memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          t_padded=t_padded, q_step=q_block, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // group, t_padded // k_block),
            in_specs=[full(), kblk(), kblk(), full(), row_full(),
                      row_full()],
            out_specs=[kblk(), kblk()],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, t_padded, d), qf.dtype),
                   jax.ShapeDtypeStruct((bh, t_padded, d), qf.dtype)],
    )(lens_bh, qf, kf, vf, dof, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Layout plumbing + public ops
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tiles(b: int, t: int, h: int):
    """(t_padded, q_block, k_block, group) for a (B, H, T, D) problem."""
    t_padded = _round_up(t, _MIN_BLOCK)
    # larger query tiles amortize per-grid-cell overhead at speech-encoder
    # sequence lengths (single q tile when T ≤ 512)
    q_block = min(t_padded, 512)
    t_padded = _round_up(t_padded, q_block)
    # the largest key block ≤512 dividing t_padded: fewer online-softmax
    # rescale passes on the VPU — k_block 128 → 512 measured 1772 → 1980
    # audio-s/s end-to-end at the inference shape (single-block = exact
    # softmax in VMEM, no rescale at all); benchmarks/PERF.md round 2
    k_block = min(t_padded, 512)
    # group must divide h so a grid cell never mixes batch items (single
    # scalar length per tile); group=4 at (512-query, 64-dim) tiles keeps
    # the kernel inside the 16 MB VMEM budget incl. double buffering
    # (group=8 exceeds it — measured scoped-vmem OOM)
    group_pref = (4, 2)
    if t_padded > 512:
        # long sequences (streaming chunks): full-length K/V stay resident
        # per cell, so shrink the per-cell footprint — (q 256 × k 512,
        # group 2) fits where (512 × 512, group 4) measured 18.2 MB > 16 MB
        q_block = 256
        group_pref = (2,)
    group = 1
    for cand in group_pref:
        if h % cand == 0:
            group = cand
            break
    return t_padded, q_block, k_block, group


def _to_flat(x, t_padded):  # (B, H, T, D) -> (B*H, Tp, D), contiguous
    b, h, t, d = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t_padded - t), (0, 0)))
    return x.reshape(b * h, t_padded, d)


def flash_attention_bhtd(q, k, v, lengths=None):
    """Pallas flash attention over the native kernel layout.

    q,k,v: (B, H, T, D); lengths: (B,) int32.  No relayout: the reshape to
    (B·H, Tp, D) is free.  K/V stay in VMEM per grid cell; online softmax
    per 128-key block (the (T, T) matrix never exists in HBM).
    """
    out, _ = _flash_fwd_bhtd(q, k, v, lengths, save_lse=False)
    return out


def _flash_fwd_bhtd(q, k, v, lengths, save_lse: bool):
    b, h, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    t_padded, q_block, k_block, group = _tiles(b, t, h)
    qf, kf, vf = (_to_flat(x, t_padded) for x in (q, k, v))
    lens_bh = jnp.repeat(lengths.astype(jnp.int32), h)  # (B*H,)
    out, lse = _fwd_call(qf, kf, vf, lens_bh, scale=scale,
                         t_padded=t_padded, q_block=q_block,
                         k_block=k_block, group=group, save_lse=save_lse)
    return out.reshape(b, h, t_padded, d)[:, :, :t], lse


def flash_attention(q, k, v, lengths=None):
    """Pallas flash attention over (B, T, H, D) (transposing wrapper kept
    for the classic layout; prefer :func:`flash_attention_bhtd`)."""
    to = lambda x: x.transpose(0, 2, 1, 3)
    return to(flash_attention_bhtd(to(q), to(k), to(v), lengths))


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
def _mha_bhtd_flash(q, k, v, lengths):
    out, _ = _flash_fwd_bhtd(q, k, v, lengths, save_lse=False)
    return out


def _mha_bhtd_flash_fwd(q, k, v, lengths):
    out, lse = _flash_fwd_bhtd(q, k, v, lengths, save_lse=True)
    return out, (q, k, v, lengths, lse, out)


def _mha_bhtd_flash_bwd(res, g):
    q, k, v, lengths, lse, out = res
    b, h, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    t_padded, q_block, k_block, group = _tiles(b, t, h)
    qf, kf, vf = (_to_flat(x, t_padded) for x in (q, k, v))
    dof = _to_flat(g, t_padded)
    of = _to_flat(out, t_padded)
    lens_bh = jnp.repeat(lengths.astype(jnp.int32), h)
    # Δ_i = Σ_d dO_id · O_id — O(T) like everything else here; stored
    # broadcast over LSE_LANES to satisfy the Mosaic tiling rule
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1, keepdims=True)           # (BH, Tp, 1)
    delta = jnp.broadcast_to(delta, delta.shape[:2] + (LSE_LANES,))
    dq, dk, dv = _bwd_call(qf, kf, vf, dof, lse, delta, lens_bh,
                           scale=scale, t_padded=t_padded, q_block=q_block,
                           k_block=k_block, group=group)
    unflat = lambda x: x.reshape(b, h, t_padded, d)[:, :, :t]
    return unflat(dq), unflat(dk), unflat(dv), None


_mha_bhtd_flash.defvjp(_mha_bhtd_flash_fwd, _mha_bhtd_flash_bwd)


# Below this many bytes of (B, H, T, T) f32 logits, XLA's fused attention
# beats the flash kernel's grid overheads on this part (same-day A/B,
# benchmarks/PERF.md round 2: at the blessed training shape B=8, T=256 the
# XLA fwd+bwd pair runs 10.1 ms vs flash's 21.4 ms per 24 layers — XLA
# materializes the small (T, T) block, which is only ~33 MB there, and its
# fusion wins; at the inference shape B=32, T=512 flash wins by 21% and
# the 537 MB logits tensor must never exist).  Dispatch by problem size,
# like any production attention library.
_FLASH_MIN_LOGITS_BYTES = 64 * 2**20


def _use_flash(b: int, h: int, t: int, d: int) -> bool:
    if not _on_tpu() or d > 256:
        return False
    return b * h * t * t * 4 > _FLASH_MIN_LOGITS_BYTES


def multi_head_attention_bhtd(q, k, v, lengths):
    """Length-masked scaled-dot-product MHA over (B, H, T, D) tensors.

    Flash (Pallas) forward AND backward on TPU for large problems; XLA for
    small ones (and everywhere off-TPU).  ``lengths`` may be None for
    dense attention.
    """
    if _use_flash(*q.shape):
        return _mha_bhtd_flash(q, k, v, lengths)
    return _xla_attention_bhtd(q, k, v, lengths)


def multi_head_attention(q, k, v, lengths):
    """Length-masked scaled-dot-product MHA over (B, T, H, D) tensors.

    Transposing wrapper over :func:`multi_head_attention_bhtd`; models that
    can produce (B, H, T, D) directly should — the relayout here is the
    cost the bhtd path removes.
    """
    b, t, h, d = q.shape
    if _use_flash(b, h, t, d):
        to = lambda x: x.transpose(0, 2, 1, 3)
        return to(_mha_bhtd_flash(to(q), to(k), to(v), lengths))
    return _xla_attention(q, k, v, lengths)
