"""Banded sliding-window attention: Pallas TPU kernel + XLA fallback.

This is the training-time hot op of CausalMultiheadSelfAttention — the
TPU-native counterpart of the reference's fused flex_attention kernel
(cusrl/nn/module/causal_attn.py:6,188-191; mask semantics from
cusrl/nn/utils/attention.py:80-133).

Problem shape: T queries attend a combined key axis of [W cache slots ++ T
sequence steps] under causal ∧ window(W) ∧ same-segment(done) ∧ validity
constraints.  The plain masked SDPA materializes [N, H, T, W+T] scores — Θ(T²)
FLOPs and HBM traffic even though each query sees at most W+1 keys.  The banded
formulation exploits the structure: query block ``qb`` (size BQ, combined
positions ``W + qb·BQ + [0, BQ)``) only touches combined key positions
``[qb·BQ, qb·BQ + BQ + W)`` — a static band of ``num_kb = 1 + ceil(W/BQ)``
BQ-sized key blocks.  Work drops to Θ(T·(BQ+W)).

Two implementations with identical semantics:

* ``_banded_reference`` — pure-JAX: gathers the key band per query block and
  runs a masked softmax over it.  Runs everywhere, fully differentiable; also
  serves as the custom-VJP backward of the Pallas path (flash-style recompute,
  keeping the backward banded too).
* ``_banded_pallas`` — a flash-attention-style Pallas kernel: grid
  ``(N, H, nQ, num_kb)``, online-softmax accumulation over the key-band blocks
  in VMEM scratch, mask computed from iota + segment/validity tiles (never
  materialized in HBM).

Numerics match ``scaled_dot_product_attention``: fp32 scores/softmax/output,
rows with no valid key produce exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["banded_window_attention"]


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


def _plan(t_len: int, s_len: int, window: int, block_q: int):
    """Static banding plan. Returns (BQ, nQ, num_kb, T_pad, S_pad)."""
    bq = min(block_q, _round_up(t_len, 8))
    num_q = -(-t_len // bq)
    num_kb = 1 + -(-window // bq)
    t_pad = num_q * bq
    s_pad = (num_q + num_kb - 1) * bq
    assert s_pad >= s_len, (s_pad, s_len)
    return bq, num_q, num_kb, t_pad, s_pad


def _pad_inputs(q, k, v, q_seg, k_seg, k_valid, t_pad: int, s_pad: int):
    t_len, s_len = q.shape[-2], k.shape[-2]
    dt, ds = t_pad - t_len, s_pad - s_len
    pad4 = lambda x, d: jnp.pad(x, ((0, 0), (0, 0), (0, d), (0, 0)))
    pad2 = lambda x, d, value: jnp.pad(x, ((0, 0), (0, d)), constant_values=value)
    q = pad4(q, dt)
    k, v = pad4(k, ds), pad4(v, ds)
    # Padded queries get segment -2, padded keys -1: they never match anything.
    q_seg = pad2(q_seg.astype(jnp.int32), dt, -2)
    k_seg = pad2(k_seg.astype(jnp.int32), ds, -1)
    k_valid = pad2(k_valid.astype(jnp.int32), ds, 0)
    return q, k, v, q_seg, k_seg, k_valid


def _band_mask(window: int, bq: int, qb, kb, q_seg_blk, k_seg_blk, k_valid_blk):
    """[BQ, BQ] bool mask for query block qb vs key block qb+kb (block units)."""
    iq = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
    q_pos = window + qb * bq + iq
    k_pos = (qb + kb) * bq + ik
    mask = (k_pos <= q_pos) & (k_pos >= q_pos - window)
    mask &= q_seg_blk[:, None] == k_seg_blk[None, :]
    mask &= k_valid_blk[None, :] > 0
    return mask, (q_pos - k_pos)


# ---------------------------------------------------------------------------
# Pure-JAX banded implementation (CPU path + backward of the Pallas path)
# ---------------------------------------------------------------------------


def _banded_reference(q, k, v, q_seg, k_seg, k_valid, window: int, slopes, block_q: int):
    """q [N,H,T,D]; k/v [N,H,S,D]; q_seg [N,T]; k_seg/k_valid [N,S]; fp32 out."""
    t_len = q.shape[-2]
    bq, num_q, num_kb, t_pad, s_pad = _plan(t_len, k.shape[-2], window, block_q)
    q, k, v, q_seg, k_seg, k_valid = _pad_inputs(q, k, v, q_seg, k_seg, k_valid, t_pad, s_pad)

    bw = num_kb * bq
    band = jnp.arange(num_q)[:, None] * bq + jnp.arange(bw)[None, :]  # [nQ, BW] combined idx
    qb = q.reshape(*q.shape[:2], num_q, bq, q.shape[-1])  # [N,H,nQ,BQ,D]
    kb = k[:, :, band]  # [N,H,nQ,BW,D]
    vb = v[:, :, band]
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum(
        "nhgqd,nhgkd->nhgqk", qb.astype(jnp.float32), kb.astype(jnp.float32)
    ) * scale  # [N,H,nQ,BQ,BW]

    iq = jax.lax.broadcasted_iota(jnp.int32, (num_q, bq, bw), 1)
    ik = jax.lax.broadcasted_iota(jnp.int32, (num_q, bq, bw), 2)
    gb = jax.lax.broadcasted_iota(jnp.int32, (num_q, bq, bw), 0)
    q_pos = window + gb * bq + iq
    k_pos = gb * bq + ik
    in_window = (k_pos <= q_pos) & (k_pos >= q_pos - window)  # [nQ,BQ,BW]
    q_seg_b = q_seg.reshape(q_seg.shape[0], num_q, bq)  # [N,nQ,BQ]
    k_seg_b = k_seg[:, band]  # [N,nQ,BW]
    k_valid_b = k_valid[:, band] > 0
    mask = (
        in_window[None]
        & (q_seg_b[:, :, :, None] == k_seg_b[:, :, None, :])
        & k_valid_b[:, :, None, :]
    )  # [N,nQ,BQ,BW]
    mask = mask[:, None]  # head axis

    if slopes is not None:
        scores = scores - slopes[None, :, None, None, None] * (q_pos - k_pos).astype(jnp.float32)[None, None]
    scores = jnp.where(mask, scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    weights = jnp.where(jnp.any(mask, axis=-1, keepdims=True), weights, 0.0)
    out = jnp.einsum("nhgqk,nhgkd->nhgqd", weights, vb.astype(jnp.float32))
    return out.reshape(*out.shape[:2], t_pad, out.shape[-1])[:, :, :t_len]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _attention_kernel(
    q_seg_ref,
    k_seg_ref,
    k_valid_ref,
    slopes_ref,
    q_ref,
    k_ref,
    v_ref,
    out_ref,
    acc_ref,
    m_ref,
    l_ref,
    *,
    window: int,
    num_kb: int,
    scale: float,
    use_alibi: bool,
):
    from jax.experimental import pallas as pl

    qb = pl.program_id(2)
    kb = pl.program_id(3)
    bq = q_ref.shape[-2]

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    v = v_ref[0, 0].astype(jnp.float32)
    scores = (
        jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )  # [BQ, BQ]

    # Segment/validity rows arrive as (8, BQ) band blocks (banding done by the
    # BlockSpec index maps; BQ=128 so lane blocks meet Mosaic's tiling rules);
    # select this batch row in-kernel.
    row = pl.program_id(0) % 8
    mask, distance = _band_mask(
        window, bq, qb, kb, q_seg_ref[row], k_seg_ref[row], k_valid_ref[row]
    )
    if use_alibi:
        scores = scores - slopes_ref[pl.program_id(1), 0] * distance.astype(jnp.float32)
    scores = jnp.where(mask, scores, -1e30)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    # exp(-1e30 - (-1e30)) would be 1 for fully-masked rows; zero them exactly.
    p = jnp.where(mask, jnp.exp(scores - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == num_kb - 1)
    def _finish():
        l = l_ref[:, :1]
        out_ref[0, 0, :, :] = jnp.where(l > 0, acc_ref[...] / jnp.where(l > 0, l, 1.0), 0.0)


def _banded_pallas(q, k, v, q_seg, k_seg, k_valid, window: int, slopes, block_q: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, t_len, head_dim = q.shape
    # The compiled kernel always uses BQ=128: Mosaic's lane tiling requires
    # either 128-divisible lane blocks or full-array blocks, and block-granular
    # banding (the index maps below) needs the band stride to BE the lane
    # block.  (block_q still controls the XLA reference/backward banding.)
    bq = 128
    num_q = -(-t_len // bq)
    num_kb = 1 + -(-window // bq)
    t_pad = num_q * bq
    s_pad = (num_q + num_kb - 1) * bq
    assert s_pad >= k.shape[-2], (s_pad, k.shape[-2])
    q, k, v, q_seg, k_seg, k_valid = _pad_inputs(q, k, v, q_seg, k_seg, k_valid, t_pad, s_pad)
    # Mosaic block constraint: the segment blocks are (8, bq), so the batch
    # axis must divide by 8 (padded rows never match: segment -2 vs key -1).
    n_pad = -(-n // 8) * 8
    if n_pad != n:
        pad_batch4 = lambda x: jnp.pad(x, ((0, n_pad - n), (0, 0), (0, 0), (0, 0)))
        q, k, v = pad_batch4(q), pad_batch4(k), pad_batch4(v)
        q_seg = jnp.pad(q_seg, ((0, n_pad - n), (0, 0)), constant_values=-2)
        k_seg = jnp.pad(k_seg, ((0, n_pad - n), (0, 0)), constant_values=-1)
        k_valid = jnp.pad(k_valid, ((0, n_pad - n), (0, 0)), constant_values=0)
    use_alibi = slopes is not None
    slopes_in = (slopes if use_alibi else jnp.zeros(h, jnp.float32)).reshape(h, 1).astype(jnp.float32)

    kernel = functools.partial(
        _attention_kernel,
        window=window,
        num_kb=num_kb,
        scale=1.0 / float(np.sqrt(head_dim)),
        use_alibi=use_alibi,
    )
    grid = (n_pad, h, num_q, num_kb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, bq), lambda n_, h_, qb, kb: (n_ // 8, qb)),  # q_seg
            pl.BlockSpec((8, bq), lambda n_, h_, qb, kb: (n_ // 8, qb + kb)),  # k_seg
            pl.BlockSpec((8, bq), lambda n_, h_, qb, kb: (n_ // 8, qb + kb)),  # k_valid
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slopes [H,1], indexed in-kernel
            pl.BlockSpec((1, 1, bq, head_dim), lambda n_, h_, qb, kb: (n_, h_, qb, 0)),  # q
            pl.BlockSpec((1, 1, bq, head_dim), lambda n_, h_, qb, kb: (n_, h_, qb + kb, 0)),  # k
            pl.BlockSpec((1, 1, bq, head_dim), lambda n_, h_, qb, kb: (n_, h_, qb + kb, 0)),  # v
        ],
        out_specs=pl.BlockSpec((1, 1, bq, head_dim), lambda n_, h_, qb, kb: (n_, h_, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, h, t_pad, head_dim), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bq, head_dim), jnp.float32),  # acc
            pltpu.VMEM((bq, 128), jnp.float32),  # running max
            pltpu.VMEM((bq, 128), jnp.float32),  # running denom
        ],
        interpret=interpret,
    )(q_seg, k_seg, k_valid, slopes_in, q, k, v)
    return out[:n, :, :t_len]


# ---------------------------------------------------------------------------
# Public op with custom VJP (backward = banded reference, flash-style recompute)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _banded_op(q, k, v, q_seg, k_seg, k_valid, slopes, window, block_q, use_pallas):
    if use_pallas:
        return _banded_pallas(q, k, v, q_seg, k_seg, k_valid, window, slopes, block_q, interpret=False)
    return _banded_reference(q, k, v, q_seg, k_seg, k_valid, window, slopes, block_q)


def _banded_op_fwd(q, k, v, q_seg, k_seg, k_valid, slopes, window, block_q, use_pallas):
    out = _banded_op(q, k, v, q_seg, k_seg, k_valid, slopes, window, block_q, use_pallas)
    return out, (q, k, v, q_seg, k_seg, k_valid, slopes)


def _banded_op_bwd(window, block_q, use_pallas, residuals, g):
    q, k, v, q_seg, k_seg, k_valid, slopes = residuals

    def forward(q_, k_, v_):
        return _banded_reference(q_, k_, v_, q_seg, k_seg, k_valid, window, slopes, block_q)

    _, vjp = jax.vjp(forward, q, k, v)
    dq, dk, dv = vjp(g.astype(jnp.float32))
    float0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    d_slopes = None if slopes is None else jnp.zeros_like(slopes)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        float0(q_seg),
        float0(k_seg),
        float0(k_valid),
        d_slopes,
    )


_banded_op.defvjp(_banded_op_fwd, _banded_op_bwd)


def banded_window_attention(
    q,
    k,
    v,
    q_seg,
    k_seg,
    k_valid,
    *,
    window: int,
    slopes=None,
    block_q: int = 128,
    use_pallas: bool | None = None,
):
    """Sliding-window segment-masked attention over a combined key axis.

    Args:
      q: ``[N, H, T, D]`` queries (combined positions ``W + t``).
      k, v: ``[N, H, S, D]`` with ``S = W + T`` (cache ++ sequence).
      q_seg: ``[N, T]`` int episode-segment id per query step.
      k_seg: ``[N, S]`` int segment id per combined key (cache slots = 0).
      k_valid: ``[N, S]`` key validity (cache mask ++ ones).
      window: attention window W; query t sees combined keys ``[t, W+t]``.
      slopes: optional ``[H]`` ALiBi slopes (bias ``-slope·distance``).
      use_pallas: force the Pallas kernel (default: TPU backend only).

    Returns fp32 ``[N, H, T, D]``; rows with no valid key are exactly zero.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    q_seg = q_seg.astype(jnp.int32)
    k_seg = k_seg.astype(jnp.int32)
    k_valid = k_valid.astype(jnp.int32)
    return _banded_op(q, k, v, q_seg, k_seg, k_valid, slopes, window, block_q, use_pallas)
