"""Micro-T windowed attention: whole-sequence attention fused per env block.

The RL training shapes (T=24 steps, window 16 -> S=40 combined keys, D=32,
H=4) are hostile to both the XLA SDPA path (~40 HLO ops per minibatch step,
op-count/layout-bound at ~2% MFU — see benchmarks/ATTENTION_TPU.md round 3)
and the long-T banded flash kernel (per-(n,h) 128-row tiles waste 81% at
T=24).  Here one kernel instance processes a BLOCK OF ENVS with the ENTIRE
[T, S] attention resident in VMEM: per (env, head) the score matmul, masked
softmax, and PV contraction run back-to-back with zero HBM round trips, and
the backward recomputes nothing — probabilities are saved ([N, H, T, S] is
small at these shapes).

Mask semantics identical to causal_attn._sequence_batched / the banded kernel
(window ∧ same-episode-segment ∧ key-valid); equality is enforced against the
reference in tests/test_micro_attention.py.

Reference capability: flex_attention's fused kernel
(cusrl/nn/module/causal_attn.py:6,188-191) — re-designed for micro sequence
lengths instead of translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["micro_window_attention", "micro_reference", "supports_micro_attention"]

_BN = 8  # envs per kernel instance (sublane-friendly)


def supports_micro_attention(t_len: int, s_len: int) -> bool:
    """The whole [T, S] score block must be register/VMEM-friendly."""
    return t_len <= 128 and s_len <= 256


# ---------------------------------------------------------------------------
# XLA reference (fallback + oracle) — same math as _sequence_batched's SDPA.
# ---------------------------------------------------------------------------


def micro_reference(q, k, v, q_seg, k_seg, k_valid, window: int, slopes=None):
    n, h, t_len, d = q.shape
    s_len = k.shape[2]
    scale = 1.0 / np.sqrt(d)
    q_pos = window + jnp.arange(t_len)
    k_pos = jnp.arange(s_len)
    in_window = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] >= q_pos[:, None] - window)
    same_seg = q_seg[:, :, None] == k_seg[:, None, :]  # [N, T, S]
    mask = in_window[None] & same_seg & (k_valid[:, None, :] > 0)  # [N, T, S]
    scores = jnp.einsum("nhtd,nhsd->nhts", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if slopes is not None:
        distance = (q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)
        scores = scores - slopes[None, :, None, None] * distance[None, None]
    scores = jnp.where(mask[:, None], scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    weights = jnp.where(mask[:, None], weights, 0.0)  # fully-masked rows -> 0
    return jnp.einsum("nhts,nhsd->nhtd", weights, v.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _mask_for(b, window, t_len, s_len, q_seg_ref, k_seg_ref, k_valid_ref):
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (t_len, s_len), 0)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (t_len, s_len), 1)
    in_window = (s_idx <= window + t_idx) & (s_idx >= t_idx)
    q_seg = q_seg_ref[b : b + 1, :]  # [1, T]
    k_seg = k_seg_ref[b : b + 1, :]  # [1, S]
    same = jnp.transpose(q_seg) == k_seg  # [T, S] via broadcast
    valid = k_valid_ref[b : b + 1, :] > 0  # [1, S]
    return in_window & same & valid


def _fwd_kernel(window, t_len, s_len, num_heads, use_alibi, save_p,
                q_seg_ref, k_seg_ref, k_valid_ref, slopes_ref, q_ref, k_ref, v_ref, *outs):
    out_ref = outs[0]
    p_ref = outs[1] if save_p else None
    d = q_ref.shape[-1]
    scale = 1.0 / float(np.sqrt(d))
    t_pos = jax.lax.broadcasted_iota(jnp.int32, (t_len, s_len), 0)
    s_pos = jax.lax.broadcasted_iota(jnp.int32, (t_len, s_len), 1)
    distance = ((window + t_pos) - s_pos).astype(jnp.float32)
    for b in range(_BN):
        mask = _mask_for(b, window, t_len, s_len, q_seg_ref, k_seg_ref, k_valid_ref)
        for h in range(num_heads):
            q = q_ref[b, h].astype(jnp.float32)  # [T, D]
            k = k_ref[b, h].astype(jnp.float32)  # [S, D]
            v = v_ref[b, h].astype(jnp.float32)
            scores = (
                jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                * scale
            )  # [T, S]
            if use_alibi:
                scores = scores - slopes_ref[h, 0] * distance
            scores = jnp.where(mask, scores, -1e30)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.where(mask, jnp.exp(scores - m), 0.0)
            l = jnp.sum(p, axis=1, keepdims=True)
            p = p / jnp.where(l > 0, l, 1.0)
            out_ref[b, h] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            if p_ref is not None:
                p_ref[b, h] = p


def _bwd_kernel(window, t_len, s_len, num_heads, use_alibi,
                q_seg_ref, k_seg_ref, k_valid_ref, slopes_ref, q_ref, k_ref, v_ref, p_ref, g_ref,
                dq_ref, dk_ref, dv_ref):
    d = q_ref.shape[-1]
    scale = 1.0 / float(np.sqrt(d))
    for b in range(_BN):
        for h in range(num_heads):
            p = p_ref[b, h]  # [T, S] fp32 (already masked/normalized)
            g = g_ref[b, h].astype(jnp.float32)  # [T, D]
            v = v_ref[b, h].astype(jnp.float32)  # [S, D]
            q = q_ref[b, h].astype(jnp.float32)
            k = k_ref[b, h].astype(jnp.float32)
            # dv = p^T g
            dv_ref[b, h] = jax.lax.dot_general(
                p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dp = g v^T
            dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            # softmax backward: ds = p * (dp - sum(dp * p))
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            ds = ds * scale
            dq_ref[b, h] = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk_ref[b, h] = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )


def _pad_batch(x, n_pad, fill=0):
    pad = n_pad - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def _run_fwd(q, k, v, q_seg, k_seg, k_valid, window, slopes, interpret, save_p):
    n, h, t_len, d = q.shape
    s_len = k.shape[2]
    n_pad = -(-n // _BN) * _BN
    q, k, v = _pad_batch(q, n_pad), _pad_batch(k, n_pad), _pad_batch(v, n_pad)
    q_seg = _pad_batch(q_seg, n_pad, fill=-2)
    k_seg = _pad_batch(k_seg, n_pad, fill=-1)
    k_valid = _pad_batch(k_valid, n_pad, fill=0)
    use_alibi = slopes is not None
    slopes_in = (slopes if use_alibi else jnp.zeros(h, jnp.float32)).reshape(h, 1).astype(jnp.float32)

    grid = (n_pad // _BN,)
    qkv_spec = lambda s: pl.BlockSpec((_BN, h, s, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    seg_spec = lambda s: pl.BlockSpec((_BN, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = [qkv_spec(t_len)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, h, t_len, d), jnp.float32)]
    if save_p:
        out_specs.append(pl.BlockSpec((_BN, h, t_len, s_len), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, h, t_len, s_len), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, window, t_len, s_len, h, use_alibi, save_p),
        grid=grid,
        in_specs=[
            seg_spec(t_len), seg_spec(s_len), seg_spec(s_len),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qkv_spec(t_len), qkv_spec(s_len), qkv_spec(s_len),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(q_seg, k_seg, k_valid, slopes_in, q, k, v)
    if save_p:
        return outs[0][:n], outs[1]
    return outs[0][:n], None


def _run_bwd(q, k, v, q_seg, k_seg, k_valid, p_saved, g, window, slopes, interpret):
    n, h, t_len, d = q.shape
    s_len = k.shape[2]
    n_pad = p_saved.shape[0]
    q, k, v = _pad_batch(q, n_pad), _pad_batch(k, n_pad), _pad_batch(v, n_pad)
    g = _pad_batch(g.astype(jnp.float32), n_pad)
    q_seg = _pad_batch(q_seg, n_pad, fill=-2)
    k_seg = _pad_batch(k_seg, n_pad, fill=-1)
    k_valid = _pad_batch(k_valid, n_pad, fill=0)
    use_alibi = slopes is not None
    slopes_in = (slopes if use_alibi else jnp.zeros(h, jnp.float32)).reshape(h, 1).astype(jnp.float32)

    grid = (n_pad // _BN,)
    qkv_spec = lambda s: pl.BlockSpec((_BN, h, s, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    seg_spec = lambda s: pl.BlockSpec((_BN, s), lambda i: (i, 0), memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((_BN, h, t_len, s_len), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, window, t_len, s_len, h, use_alibi),
        grid=grid,
        in_specs=[
            seg_spec(t_len), seg_spec(s_len), seg_spec(s_len),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qkv_spec(t_len), qkv_spec(s_len), qkv_spec(s_len), p_spec, qkv_spec(t_len),
        ],
        out_specs=[qkv_spec(t_len), qkv_spec(s_len), qkv_spec(s_len)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, h, t_len, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, h, s_len, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, h, s_len, d), jnp.float32),
        ],
        interpret=interpret,
    )(q_seg, k_seg, k_valid, slopes_in, q, k, v, p_saved, g)
    return dq[:n], dk[:n], dv[:n]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _micro_op(q, k, v, q_seg, k_seg, k_valid, slopes, window, use_pallas, interpret):
    if use_pallas:
        out, _ = _run_fwd(q, k, v, q_seg, k_seg, k_valid, window, slopes, interpret, save_p=False)
        return out
    return micro_reference(q, k, v, q_seg, k_seg, k_valid, window, slopes)


def _micro_op_fwd(q, k, v, q_seg, k_seg, k_valid, slopes, window, use_pallas, interpret):
    if use_pallas:
        out, p_saved = _run_fwd(q, k, v, q_seg, k_seg, k_valid, window, slopes, interpret, save_p=True)
        return out, (q, k, v, q_seg, k_seg, k_valid, slopes, p_saved)
    out = _micro_op(q, k, v, q_seg, k_seg, k_valid, slopes, window, use_pallas, interpret)
    return out, (q, k, v, q_seg, k_seg, k_valid, slopes, None)


def _micro_op_bwd(window, use_pallas, interpret, residuals, g):
    q, k, v, q_seg, k_seg, k_valid, slopes, p_saved = residuals
    if use_pallas:
        dq, dk, dv = _run_bwd(q, k, v, q_seg, k_seg, k_valid, p_saved, g, window, slopes, interpret)
    else:
        def forward(q_, k_, v_):
            return micro_reference(q_, k_, v_, q_seg, k_seg, k_valid, window, slopes)

        _, vjp = jax.vjp(forward, q, k, v)
        dq, dk, dv = vjp(g.astype(jnp.float32))
    float0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    d_slopes = None if slopes is None else jnp.zeros_like(slopes)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        float0(q_seg), float0(k_seg), float0(k_valid), d_slopes,
    )


_micro_op.defvjp(_micro_op_fwd, _micro_op_bwd)


def micro_window_attention(q, k, v, q_seg, k_seg, k_valid, *, window: int, slopes=None,
                           use_pallas: bool | None = None, interpret: bool = False):
    """Fused short-sequence windowed attention.

    Args match banded_window_attention: q ``[N, H, T, D]``, k/v ``[N, H, S, D]``
    with ``S = W + T``; q_seg ``[N, T]``, k_seg/k_valid ``[N, S]``.  Returns
    fp32 ``[N, H, T, D]``; fully-masked rows are exact zeros.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    q_seg = q_seg.astype(jnp.int32)
    k_seg = k_seg.astype(jnp.int32)
    k_valid = k_valid.astype(jnp.int32)
    return _micro_op(q, k, v, q_seg, k_seg, k_valid, slopes, window, bool(use_pallas), interpret)
