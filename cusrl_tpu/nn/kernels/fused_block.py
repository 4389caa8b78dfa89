"""Fused transformer-block matmul kernels (the round-5 attention-path op).

The transformer PPO update at RL shapes (embed 128, T=24, thousands of envs) is
matmul-launch-bound, not FLOP-bound: at round-4 close the per-iteration profile
was projections ~20 ms at ~50% MFU + LayerNorm chains ~9 ms around the lane
attention kernel (benchmarks/ATTENTION_TPU.md round-4).  These two kernels run
every matmul and LayerNorm of one `CausalTransformerEncoderLayer` (pre-norm,
residual gates — the preset default) as two Pallas programs bracketing the
attention kernel:

* ``fused_block_pre``:  h = input_proj(x); y = LN1(h); qkv = y @ Wqkv + b
  — one row tile in VMEM does 2 matmuls + the norm; emits the residual ``h``
  and the fused ``qkv`` (the reference computes q/k/v as three separate dots
  plus a separate norm pass, cusrl/nn/module/causal_attn.py:188-259).
* ``fused_block_post``: r1 = h + attn @ Wo + b; out = r1 + FFN(LN2(r1))
  — out-projection, both residual adds, LN2, and the 2-layer FFN in one
  program.

Between them the attention core (lane/banded kernel + RoPE + cache plumbing)
stays in its existing form; autodiff composes the three custom-vjp ops.

Numerics mirror the XLA module path exactly where it matters: bf16 matmul
operands with fp32 accumulation and fp32 bias, LayerNorm in fp32 (eps 1e-6)
cast back to bf16, residual adds in bf16 (matching ResidualGate over bf16
activations), activations computed in fp32 in-kernel (Mosaic v5e rejects bf16
comparisons) and rounded to bf16.  The backward recomputes LayerNorm statistics
and the FFN hidden from saved bf16 tensors (cheap VPU work) instead of saving
centered/normalized fp32 tensors; the FFN save slot holds the post-activation
(elu family — derivative recoverable from the output) or the bf16
pre-activation (gelu), exactly like nn/kernels/fused_mlp.py.

Primal-only calls (rollout value passes, KL statistics) must NOT emit the
saved-activation outputs — XLA cannot DCE Pallas outputs (ROADMAP kernel rule).
``fused_block_pre`` needs no distinction (both of its outputs are primal);
``fused_block_post`` has a saveless primal variant.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cusrl_tpu.nn.kernels.fused_mlp import (
    _PREACT_ACTIVATIONS,
    _act,
    _act_kernel,
    _const_spec,
    _dact_from_h,
    _dact_from_z,
    _pad_rows,
    _row_spec,
    _mesh_data_axes,
    kernel_mesh_status,
)

__all__ = ["fused_block_pre", "fused_block_post", "supports_fused_block"]

_LN_EPS = 1e-6
_SUPPORTED = ("elu", "relu", "tanh", "gelu", "identity", "none")
_DEFAULT_BLOCK = int(os.environ.get("CUSRL_TPU_TFBLOCK_ROWS", 1024))


def supports_fused_block(activation: str) -> bool:
    return activation in _SUPPORTED


# ---------------------------------------------------------------------------
# In-kernel LayerNorm (fp32, eps 1e-6 — matches nn/layer/mha._LayerNorm)
# ---------------------------------------------------------------------------


def _ln_fwd(x32, scale, bias):
    mean = jnp.mean(x32, axis=1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """Row-wise LN input cotangent; parameter grads are the caller's sums."""
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2)


def _dot_nt(a, b):
    """a^T @ b with fp32 accumulation (rows contracted) — the dW contraction."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _dot_tn(a, w):
    """a @ w^T with fp32 accumulation — the dX back-propagation contraction."""
    return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# XLA references (fallback + correctness oracle) — match the module-path math
# ---------------------------------------------------------------------------


def _ln_ref(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + _LN_EPS) * scale.reshape(-1) + bias.reshape(-1)).astype(x.dtype)


def _linear_ref(x, w, b):
    y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(jnp.bfloat16)


def _pre_reference(x, w_in, b_in, g1, bb1, w_qkv, b_qkv):
    h = _linear_ref(x, w_in, b_in)
    y = _ln_ref(h, g1, bb1)
    return h, _linear_ref(y, w_qkv, b_qkv)


def _post_reference(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down, activation):
    r1 = h + _linear_ref(attn, w_o, b_o)
    y2 = _ln_ref(r1, g2, bb2)
    z1 = _linear_ref(y2, w_up, b_up)
    if activation in ("identity", "none"):
        hid = z1
    else:
        hid = _act(activation, z1)
    return r1 + _linear_ref(hid, w_down, b_down)


# ---------------------------------------------------------------------------
# PRE kernels: h = input_proj(x); qkv = LN1(h) @ Wqkv + b
# ---------------------------------------------------------------------------


def _pre_fwd_kernel(x_ref, w_in_ref, b_in_ref, g1_ref, bb1_ref, w_qkv_ref, b_qkv_ref, h_ref, qkv_ref):
    x = x_ref[...].astype(jnp.bfloat16)
    z = jnp.dot(x, w_in_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    h = (z + b_in_ref[...]).astype(jnp.bfloat16)
    h_ref[...] = h
    y, _, _ = _ln_fwd(h.astype(jnp.float32), g1_ref[...], bb1_ref[...])
    q = jnp.dot(y.astype(jnp.bfloat16), w_qkv_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    qkv_ref[...] = (q + b_qkv_ref[...]).astype(jnp.bfloat16)


def _pre_bwd_kernel(
    skip_input_grad,
    x_ref, h_ref, gh_ref, gqkv_ref, w_in_ref, w_qkv_ref, g1_ref, bb1_ref,
    *refs,
):
    if skip_input_grad:
        dx_ref = None
    else:
        dx_ref, refs = refs[0], refs[1:]
    dw_in_ref, db_in_ref, dg1_ref, dbb1_ref, dw_qkv_ref, db_qkv_ref = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw_in_ref, db_in_ref, dg1_ref, dbb1_ref, dw_qkv_ref, db_qkv_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # Recompute LN1 from the saved residual h (bf16 — identical to forward).
    h = h_ref[...]
    y, xhat, inv = _ln_fwd(h.astype(jnp.float32), g1_ref[...], bb1_ref[...])
    yb = y.astype(jnp.bfloat16)

    dqkv = gqkv_ref[...].astype(jnp.float32)
    dqkv_bf = dqkv.astype(jnp.bfloat16)
    dw_qkv_ref[...] += _dot_nt(yb, dqkv_bf)
    db_qkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dy = _dot_tn(dqkv_bf, w_qkv_ref[...].astype(jnp.bfloat16))

    dg1_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbb1_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dh = _ln_bwd(dy, xhat, inv, g1_ref[...]) + gh_ref[...].astype(jnp.float32)
    dh_bf = dh.astype(jnp.bfloat16)

    x = x_ref[...].astype(jnp.bfloat16)
    dw_in_ref[...] += _dot_nt(x, dh_bf)
    db_in_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    if dx_ref is not None:
        dx_ref[...] = _dot_tn(dh_bf, w_in_ref[...].astype(jnp.bfloat16))


def _pre_run_fwd(x, w_in, b_in, g1, bb1, w_qkv, b_qkv, block_rows, interpret):
    n = x.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    embed, qkv_dim = w_in.shape[1], w_qkv.shape[1]

    in_specs = [_row_spec(x.shape[1], tb)]
    in_specs += [_const_spec(a.shape) for a in (w_in, b_in, g1, bb1, w_qkv, b_qkv)]
    out_specs = [_row_spec(embed, tb), _row_spec(qkv_dim, tb)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_pad, qkv_dim), jnp.bfloat16),
    ]
    h, qkv = pl.pallas_call(
        _pre_fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(_pad_rows(x, n_pad), w_in, b_in, g1, bb1, w_qkv, b_qkv)
    return h[:n], qkv[:n]


def _pre_run_bwd(x, h, gh, gqkv, w_in, w_qkv, g1, bb1, block_rows, interpret, skip_input_grad):
    n = x.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)

    in_specs = [
        _row_spec(x.shape[1], tb), _row_spec(h.shape[1], tb),
        _row_spec(gh.shape[1], tb), _row_spec(gqkv.shape[1], tb),
    ]
    in_specs += [_const_spec(a.shape) for a in (w_in, w_qkv, g1, bb1)]
    out_specs = []
    out_shapes = []
    if not skip_input_grad:
        out_specs.append(_row_spec(x.shape[1], tb))
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, x.shape[1]), jnp.float32))
    for a in (w_in, (1, w_in.shape[1]), g1, bb1, w_qkv, (1, w_qkv.shape[1])):
        shape = a if isinstance(a, tuple) else a.shape
        out_specs.append(_const_spec(shape))
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_pre_bwd_kernel, skip_input_grad),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(_pad_rows(x, n_pad), _pad_rows(h, n_pad), _pad_rows(gh, n_pad), _pad_rows(gqkv, n_pad),
      w_in, w_qkv, g1, bb1)
    if skip_input_grad:
        dx = jnp.zeros_like(x)
    else:
        dx, outs = outs[0][:n], outs[1:]
    dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv = outs
    return dx, dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _pre_op(x, w_in, b_in, g1, bb1, w_qkv, b_qkv, use_pallas, block_rows, interpret, skip_input_grad):
    if use_pallas:
        return _pre_run_fwd(x, w_in, b_in, g1, bb1, w_qkv, b_qkv, block_rows, interpret)
    return _pre_reference(x, w_in, b_in, g1, bb1, w_qkv, b_qkv)


def _pre_op_fwd(x, w_in, b_in, g1, bb1, w_qkv, b_qkv, use_pallas, block_rows, interpret, skip_input_grad):
    out = _pre_op(x, w_in, b_in, g1, bb1, w_qkv, b_qkv, use_pallas, block_rows, interpret, skip_input_grad)
    if use_pallas:
        h, _ = out
        return out, (x, h, w_in, w_qkv, g1, bb1, None, None)
    return out, (x, None, w_in, w_qkv, g1, bb1, b_in, b_qkv)


def _pre_op_bwd(use_pallas, block_rows, interpret, skip_input_grad, residuals, gs):
    x, h, w_in, w_qkv, g1, bb1, b_in, b_qkv = residuals
    gh, gqkv = gs
    if use_pallas:
        dx, dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv = _pre_run_bwd(
            x, h, gh, gqkv, w_in, w_qkv, g1, bb1, block_rows, interpret, skip_input_grad
        )
        return dx.astype(x.dtype), dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv

    def f(x_, w_in_, b_in_, g1_, bb1_, w_qkv_, b_qkv_):
        return _pre_reference(x_, w_in_, b_in_, g1_, bb1_, w_qkv_, b_qkv_)

    _, vjp = jax.vjp(f, x, w_in, b_in, g1, bb1, w_qkv, b_qkv)
    return vjp(gs)


_pre_op.defvjp(_pre_op_fwd, _pre_op_bwd)


# ---------------------------------------------------------------------------
# POST kernels: r1 = h + attn @ Wo + b; out = r1 + FFN(LN2(r1))
# ---------------------------------------------------------------------------


def _post_fwd_kernel(activation, save, attn_ref, h_ref, w_o_ref, b_o_ref, g2_ref, bb2_ref,
                     w_up_ref, b_up_ref, w_down_ref, b_down_ref, out_ref, *save_refs):
    attn = attn_ref[...].astype(jnp.bfloat16)
    zo = jnp.dot(attn, w_o_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    r1 = h_ref[...] + (zo + b_o_ref[...]).astype(jnp.bfloat16)
    y2, _, _ = _ln_fwd(r1.astype(jnp.float32), g2_ref[...], bb2_ref[...])
    z = jnp.dot(y2.astype(jnp.bfloat16), w_up_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    z1 = (z + b_up_ref[...]).astype(jnp.bfloat16)
    hid = z1 if activation in ("identity", "none") else _act_kernel(activation, z1)
    f = jnp.dot(hid, w_down_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    out_ref[...] = r1 + (f + b_down_ref[...]).astype(jnp.bfloat16)
    if save:
        r1_ref, s_ref = save_refs
        r1_ref[...] = r1
        s_ref[...] = z1 if activation in _PREACT_ACTIVATIONS else hid


def _post_bwd_kernel(activation, attn_ref, g_ref, r1_ref, s_ref,
                     w_o_ref, w_up_ref, w_down_ref, g2_ref, bb2_ref, *refs):
    dattn_ref, dh_ref, dw_o_ref, db_o_ref, dg2_ref, dbb2_ref, dw_up_ref, db_up_ref, dw_down_ref, db_down_ref = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw_o_ref, db_o_ref, dg2_ref, dbb2_ref, dw_up_ref, db_up_ref, dw_down_ref, db_down_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    g = g_ref[...].astype(jnp.float32)
    g_bf = g.astype(jnp.bfloat16)

    # FFN hidden: recompute from the save slot (bf16, bit-identical to fwd).
    preact = activation in _PREACT_ACTIVATIONS
    saved = s_ref[...]
    if preact:
        hid = _act_kernel(activation, saved)
        dact = _dact_from_z(activation, saved.astype(jnp.float32))
    else:
        hid = saved
        dact = _dact_from_h(activation, saved.astype(jnp.float32))

    dw_down_ref[...] += _dot_nt(hid, g_bf)
    db_down_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    dhid = _dot_tn(g_bf, w_down_ref[...].astype(jnp.bfloat16))
    dz1 = dhid * dact
    dz1_bf = dz1.astype(jnp.bfloat16)

    # Recompute LN2 from the saved r1.
    r1 = r1_ref[...]
    y2, xhat2, inv2 = _ln_fwd(r1.astype(jnp.float32), g2_ref[...], bb2_ref[...])
    dw_up_ref[...] += _dot_nt(y2.astype(jnp.bfloat16), dz1_bf)
    db_up_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
    dy2 = _dot_tn(dz1_bf, w_up_ref[...].astype(jnp.bfloat16))

    dg2_ref[...] += jnp.sum(dy2 * xhat2, axis=0, keepdims=True)
    dbb2_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)
    dr1 = g + _ln_bwd(dy2, xhat2, inv2, g2_ref[...])
    dr1_bf = dr1.astype(jnp.bfloat16)

    attn = attn_ref[...].astype(jnp.bfloat16)
    dw_o_ref[...] += _dot_nt(attn, dr1_bf)
    db_o_ref[...] += jnp.sum(dr1, axis=0, keepdims=True)
    dattn_ref[...] = _dot_tn(dr1_bf, w_o_ref[...].astype(jnp.bfloat16))
    dh_ref[...] = dr1


def _post_run_fwd(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down,
                  activation, block_rows, interpret, save):
    n = attn.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    embed, ff_dim = w_o.shape[1], w_up.shape[1]

    in_specs = [_row_spec(attn.shape[1], tb), _row_spec(h.shape[1], tb)]
    in_specs += [_const_spec(a.shape) for a in (w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down)]
    out_specs = [_row_spec(embed, tb)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16)]
    if save:
        out_specs += [_row_spec(embed, tb), _row_spec(ff_dim, tb)]
        out_shapes += [
            jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_pad, ff_dim), jnp.bfloat16),
        ]
    outs = pl.pallas_call(
        functools.partial(_post_fwd_kernel, activation, save),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(_pad_rows(attn, n_pad), _pad_rows(h, n_pad), w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down)
    if save:
        return outs[0][:n], outs[1], outs[2]
    return outs[0][:n], None, None


def _post_run_bwd(attn, g, r1, s, w_o, w_up, w_down, g2, bb2, activation, block_rows, interpret):
    n = attn.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    embed = w_o.shape[1]

    in_specs = [
        _row_spec(attn.shape[1], tb), _row_spec(g.shape[1], tb),
        _row_spec(r1.shape[1], tb), _row_spec(s.shape[1], tb),
    ]
    in_specs += [_const_spec(a.shape) for a in (w_o, w_up, w_down, g2, bb2)]
    out_specs = [_row_spec(attn.shape[1], tb), _row_spec(embed, tb)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, attn.shape[1]), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, embed), jnp.float32),
    ]
    for a in (w_o, (1, w_o.shape[1]), g2, bb2, w_up, (1, w_up.shape[1]), w_down, (1, w_down.shape[1])):
        shape = a if isinstance(a, tuple) else a.shape
        out_specs.append(_const_spec(shape))
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_post_bwd_kernel, activation),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(_pad_rows(attn, n_pad), _pad_rows(g, n_pad), r1, s, w_o, w_up, w_down, g2, bb2)
    dattn, dh = outs[0][:n], outs[1][:n]
    dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down = outs[2:]
    return dattn, dh, dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def _post_op(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down,
             activation, use_pallas, block_rows, interpret):
    if use_pallas:
        return _post_run_fwd(
            attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down,
            activation, block_rows, interpret, save=False,
        )[0]
    return _post_reference(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down, activation)


def _post_op_fwd(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down,
                 activation, use_pallas, block_rows, interpret):
    if use_pallas:
        out, r1, s = _post_run_fwd(
            attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down,
            activation, block_rows, interpret, save=True,
        )
        return out, (attn, r1, s, w_o, w_up, w_down, g2, bb2, None, None, None)
    out = _post_reference(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down, activation)
    return out, (attn, None, None, w_o, w_up, w_down, g2, bb2, h, b_o, (b_up, b_down))


def _post_op_bwd(activation, use_pallas, block_rows, interpret, residuals, g):
    attn, r1, s, w_o, w_up, w_down, g2, bb2, h, b_o, b_rest = residuals
    if use_pallas:
        dattn, dh, dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down = _post_run_bwd(
            attn, g, r1, s, w_o, w_up, w_down, g2, bb2, activation, block_rows, interpret
        )
        return (dattn.astype(attn.dtype), dh, dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down)

    b_up, b_down = b_rest

    def f(attn_, h_, w_o_, b_o_, g2_, bb2_, w_up_, b_up_, w_down_, b_down_):
        return _post_reference(attn_, h_, w_o_, b_o_, g2_, bb2_, w_up_, b_up_, w_down_, b_down_, activation)

    _, vjp = jax.vjp(f, attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down)
    return vjp(g)


_post_op.defvjp(_post_op_fwd, _post_op_bwd)


# ---------------------------------------------------------------------------
# Mesh-aware (pure-DP) wrappers: shard rows over ``data``, psum weight grads in
# the backward body (same pattern as fused_mlp._sharded_fused_mlp) so the
# kernels survive DP meshes instead of reverting to the XLA chain.
# ---------------------------------------------------------------------------


def _sharded_pre_op(mesh, x, w_in, b_in, g1, bb1, w_qkv, b_qkv, block_rows, interpret, skip_input_grad):
    from jax.sharding import PartitionSpec as P

    axes = _mesh_data_axes(mesh)
    row, rep = P(axes[0] if len(axes) == 1 else axes), P()

    @jax.custom_vjp
    def op(x, w_in, b_in, g1, bb1, w_qkv, b_qkv):
        f = lambda *a: _pre_run_fwd(*a, block_rows, interpret)
        return jax.shard_map(f, mesh=mesh, in_specs=(row,) + (rep,) * 6, out_specs=(row, row), check_vma=False)(
            x, w_in, b_in, g1, bb1, w_qkv, b_qkv
        )

    def op_fwd(x, w_in, b_in, g1, bb1, w_qkv, b_qkv):
        h, qkv = op(x, w_in, b_in, g1, bb1, w_qkv, b_qkv)
        return (h, qkv), (x, h, w_in, w_qkv, g1, bb1)

    def op_bwd(residuals, gs):
        x, h, w_in, w_qkv, g1, bb1 = residuals
        gh, gqkv = gs

        def f(x_, h_, gh_, gqkv_, w_in_, w_qkv_, g1_, bb1_):
            outs = _pre_run_bwd(x_, h_, gh_, gqkv_, w_in_, w_qkv_, g1_, bb1_, block_rows, interpret, skip_input_grad)
            dx, grads = outs[0], outs[1:]
            return (dx,) + jax.lax.psum(grads, axes)

        outs = jax.shard_map(
            f, mesh=mesh, in_specs=(row, row, row, row, rep, rep, rep, rep),
            out_specs=(row,) + (rep,) * 6, check_vma=False,
        )(x, h, gh, gqkv, w_in, w_qkv, g1, bb1)
        dx, dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv = outs
        return dx.astype(x.dtype), dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv

    op.defvjp(op_fwd, op_bwd)
    return op(x, w_in, b_in, g1, bb1, w_qkv, b_qkv)


def _sharded_post_op(mesh, attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down,
                     activation, block_rows, interpret):
    from jax.sharding import PartitionSpec as P

    axes = _mesh_data_axes(mesh)
    row, rep = P(axes[0] if len(axes) == 1 else axes), P()

    @jax.custom_vjp
    def op(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down):
        def f(*a):
            return _post_run_fwd(*a, activation, block_rows, interpret, save=False)[0]

        return jax.shard_map(f, mesh=mesh, in_specs=(row, row) + (rep,) * 8, out_specs=row, check_vma=False)(
            attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down
        )

    def op_fwd(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down):
        def f(*a):
            return _post_run_fwd(*a, activation, block_rows, interpret, save=True)

        out, r1, s = jax.shard_map(
            f, mesh=mesh, in_specs=(row, row) + (rep,) * 8, out_specs=(row, row, row), check_vma=False
        )(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down)
        return out, (attn, r1, s, w_o, w_up, w_down, g2, bb2)

    def op_bwd(residuals, g):
        attn, r1, s, w_o, w_up, w_down, g2, bb2 = residuals

        def f(attn_, g_, r1_, s_, w_o_, w_up_, w_down_, g2_, bb2_):
            outs = _post_run_bwd(attn_, g_, r1_, s_, w_o_, w_up_, w_down_, g2_, bb2_, activation, block_rows, interpret)
            dattn, dh, grads = outs[0], outs[1], outs[2:]
            return (dattn, dh) + jax.lax.psum(grads, axes)

        outs = jax.shard_map(
            f, mesh=mesh, in_specs=(row, row, row, row, rep, rep, rep, rep, rep),
            out_specs=(row, row) + (rep,) * 8, check_vma=False,
        )(attn, g, r1, s, w_o, w_up, w_down, g2, bb2)
        dattn, dh = outs[0], outs[1]
        dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down = outs[2:]
        return dattn.astype(attn.dtype), dh, dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down

    op.defvjp(op_fwd, op_bwd)
    return op(attn, h, w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def fused_block_pre(
    x, w_in, b_in, ln1_scale, ln1_bias, w_qkv, b_qkv,
    *, use_pallas: bool | None = None, block_rows: int | None = None,
    interpret: bool = False, skip_input_grad: bool = True,
):
    """h = input_proj(x); qkv = LN1(h) @ Wqkv + b — one Pallas program.

    Layouts: ``w_in [in, E]``, ``w_qkv [E, 3E]`` (pass ``weight.T``); biases and
    LN params ``[1, dim]`` fp32.  Returns ``(h [N, E] bf16, qkv [N, 3E] bf16)``.
    ``skip_input_grad=True`` declares x is data (observations) — the backward
    skips the first dX matmul and returns zeros for it.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    block_rows = block_rows or _DEFAULT_BLOCK
    if use_pallas:
        allowed, wrap_mesh = kernel_mesh_status(x.shape[0])
        if not allowed:
            use_pallas = False
        elif wrap_mesh is not None:
            return _sharded_pre_op(
                wrap_mesh, x, w_in, b_in, ln1_scale, ln1_bias, w_qkv, b_qkv,
                block_rows, interpret, bool(skip_input_grad),
            )
    with jax.named_scope("block_pre"):
        return _pre_op(
            x, w_in, b_in, ln1_scale, ln1_bias, w_qkv, b_qkv,
            bool(use_pallas), block_rows, interpret, bool(skip_input_grad),
        )


def fused_block_post(
    attn, h, w_o, b_o, ln2_scale, ln2_bias, w_up, b_up, w_down, b_down,
    activation: str = "gelu",
    *, use_pallas: bool | None = None, block_rows: int | None = None, interpret: bool = False,
):
    """r1 = h + attn @ Wo + b; out = r1 + FFN(LN2(r1)) — one Pallas program.

    ``attn`` is the merged-heads attention output (pre-out-projection, fp32 from
    the lane/banded kernels); ``h`` the bf16 residual from ``fused_block_pre``.
    Returns bf16 ``[N, E]``.
    """
    activation = activation.lower() if isinstance(activation, str) else activation
    if not supports_fused_block(activation):
        return _post_reference(attn, h, w_o, b_o, ln2_scale, ln2_bias, w_up, b_up, w_down, b_down, activation)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    block_rows = block_rows or _DEFAULT_BLOCK
    if use_pallas:
        allowed, wrap_mesh = kernel_mesh_status(attn.shape[0])
        if not allowed:
            use_pallas = False
        elif wrap_mesh is not None:
            return _sharded_post_op(
                wrap_mesh, attn, h, w_o, b_o, ln2_scale, ln2_bias, w_up, b_up, w_down, b_down,
                activation, block_rows, interpret,
            )
    with jax.named_scope("block_post"):
        return _post_op(
            attn, h, w_o, b_o, ln2_scale, ln2_bias, w_up, b_up, w_down, b_down,
            activation, bool(use_pallas), block_rows, interpret,
        )


# ---------------------------------------------------------------------------
# Paired variants: actor+critic block chains in ONE kernel per row tile (the
# same two-chain pattern as fused_mlp_pair — halves kernel launches/pipeline
# ramps per minibatch step; the attention middle runs ONE lane call over the
# env-concatenated halves since attention has no weights).
# ---------------------------------------------------------------------------


def _pair_pre_fwd_kernel(xa_ref, xc_ref, *refs):
    wa = refs[0:6]   # w_in, b_in, g1, bb1, w_qkv, b_qkv
    wc = refs[6:12]
    ha_ref, hc_ref, qkva_ref, qkvc_ref = refs[12:16]

    def chain(x_ref, params, h_ref, qkv_ref):
        w_in, b_in, g1, bb1, w_qkv, b_qkv = params
        x = x_ref[...].astype(jnp.bfloat16)
        z = jnp.dot(x, w_in[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        h = (z + b_in[...]).astype(jnp.bfloat16)
        h_ref[...] = h
        y, _, _ = _ln_fwd(h.astype(jnp.float32), g1[...], bb1[...])
        q = jnp.dot(y.astype(jnp.bfloat16), w_qkv[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        qkv_ref[...] = (q + b_qkv[...]).astype(jnp.bfloat16)

    chain(xa_ref, wa, ha_ref, qkva_ref)
    chain(xc_ref, wc, hc_ref, qkvc_ref)


def _pair_pre_bwd_kernel(skip_input_grad, xa_ref, xc_ref, ha_ref, hc_ref,
                         gha_ref, ghc_ref, gqkva_ref, gqkvc_ref, *refs):
    wa = refs[0:4]   # w_in, w_qkv, g1, bb1
    wc = refs[4:8]
    refs = refs[8:]
    if skip_input_grad:
        dxa_ref = dxc_ref = None
    else:
        dxa_ref, dxc_ref = refs[0], refs[1]
        refs = refs[2:]
    douts_a = refs[0:6]  # dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv
    douts_c = refs[6:12]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (*douts_a, *douts_c):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    def chain_bwd(x_ref, h_ref, gh_ref, gqkv_ref, params, douts, dx_ref):
        w_in, w_qkv, g1, bb1 = params
        dw_in_ref, db_in_ref, dg1_ref, dbb1_ref, dw_qkv_ref, db_qkv_ref = douts
        h = h_ref[...]
        y, xhat, inv = _ln_fwd(h.astype(jnp.float32), g1[...], bb1[...])
        yb = y.astype(jnp.bfloat16)
        dqkv = gqkv_ref[...].astype(jnp.float32)
        dqkv_bf = dqkv.astype(jnp.bfloat16)
        dw_qkv_ref[...] += _dot_nt(yb, dqkv_bf)
        db_qkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
        dy = _dot_tn(dqkv_bf, w_qkv[...].astype(jnp.bfloat16))
        dg1_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
        dbb1_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
        dh = _ln_bwd(dy, xhat, inv, g1[...]) + gh_ref[...].astype(jnp.float32)
        dh_bf = dh.astype(jnp.bfloat16)
        x = x_ref[...].astype(jnp.bfloat16)
        dw_in_ref[...] += _dot_nt(x, dh_bf)
        db_in_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
        if dx_ref is not None:
            dx_ref[...] = _dot_tn(dh_bf, w_in[...].astype(jnp.bfloat16))

    chain_bwd(xa_ref, ha_ref, gha_ref, gqkva_ref, wa, douts_a, dxa_ref)
    chain_bwd(xc_ref, hc_ref, ghc_ref, gqkvc_ref, wc, douts_c, dxc_ref)


def _pair_pre_run_fwd(xa, xc, pa, pc, block_rows, interpret):
    n = xa.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    embed, qkv_dim = pa[0].shape[1], pa[4].shape[1]

    in_specs = [_row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb)]
    in_specs += [_const_spec(a.shape) for a in pa] + [_const_spec(a.shape) for a in pc]
    out_specs = [_row_spec(embed, tb), _row_spec(embed, tb),
                 _row_spec(qkv_dim, tb), _row_spec(qkv_dim, tb)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_pad, qkv_dim), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_pad, qkv_dim), jnp.bfloat16),
    ]
    ha, hc, qkva, qkvc = pl.pallas_call(
        _pair_pre_fwd_kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(_pad_rows(xa, n_pad), _pad_rows(xc, n_pad), *pa, *pc)
    return ha[:n], hc[:n], qkva[:n], qkvc[:n]


def _pair_pre_run_bwd(xa, xc, ha, hc, gha, ghc, gqkva, gqkvc, wa, wc, block_rows, interpret, skip_input_grad):
    n = xa.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)

    row_ins = [xa, xc, ha, hc, gha, ghc, gqkva, gqkvc]
    in_specs = [_row_spec(a.shape[1], tb) for a in row_ins]
    in_specs += [_const_spec(a.shape) for a in wa] + [_const_spec(a.shape) for a in wc]
    out_specs, out_shapes = [], []
    if not skip_input_grad:
        for x in (xa, xc):
            out_specs.append(_row_spec(x.shape[1], tb))
            out_shapes.append(jax.ShapeDtypeStruct((n_pad, x.shape[1]), jnp.float32))
    for w_in, w_qkv, g1, bb1 in (wa, wc):
        for shape in (w_in.shape, (1, w_in.shape[1]), g1.shape, bb1.shape, w_qkv.shape, (1, w_qkv.shape[1])):
            out_specs.append(_const_spec(shape))
            out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_pair_pre_bwd_kernel, skip_input_grad),
        grid=grid, in_specs=in_specs, out_specs=out_specs, out_shape=out_shapes,
        interpret=interpret,
    )(*[_pad_rows(a, n_pad) for a in row_ins], *wa, *wc)
    if skip_input_grad:
        dxa, dxc = jnp.zeros_like(xa), jnp.zeros_like(xc)
    else:
        dxa, dxc = outs[0][:n], outs[1][:n]
        outs = outs[2:]
    return dxa, dxc, tuple(outs[:6]), tuple(outs[6:12])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _pair_pre_op(xa, xc, pa, pc, use_pallas, block_rows, interpret, skip_input_grad):
    if use_pallas:
        return _pair_pre_run_fwd(xa, xc, pa, pc, block_rows, interpret)
    ha, qkva = _pre_reference(xa, *pa)
    hc, qkvc = _pre_reference(xc, *pc)
    return ha, hc, qkva, qkvc


def _pair_pre_op_fwd(xa, xc, pa, pc, use_pallas, block_rows, interpret, skip_input_grad):
    out = _pair_pre_op(xa, xc, pa, pc, use_pallas, block_rows, interpret, skip_input_grad)
    ha, hc, _, _ = out
    return out, (xa, xc, ha, hc, pa, pc)


def _pair_pre_op_bwd(use_pallas, block_rows, interpret, skip_input_grad, residuals, gs):
    xa, xc, ha, hc, pa, pc = residuals
    gha, ghc, gqkva, gqkvc = gs
    if use_pallas:
        wa = (pa[0], pa[4], pa[2], pa[3])  # w_in, w_qkv, g1, bb1
        wc = (pc[0], pc[4], pc[2], pc[3])
        dxa, dxc, da, dc = _pair_pre_run_bwd(
            xa, xc, ha, hc, gha, ghc, gqkva, gqkvc, wa, wc, block_rows, interpret, skip_input_grad
        )
        # Kernel grad order: dw_in, db_in, dg1, dbb1, dw_qkv, db_qkv == param order.
        return dxa.astype(xa.dtype), dxc.astype(xc.dtype), da, dc

    def f(xa_, xc_, pa_, pc_):
        ha_, qkva_ = _pre_reference(xa_, *pa_)
        hc_, qkvc_ = _pre_reference(xc_, *pc_)
        return ha_, hc_, qkva_, qkvc_

    _, vjp = jax.vjp(f, xa, xc, pa, pc)
    return vjp(gs)


_pair_pre_op.defvjp(_pair_pre_op_fwd, _pair_pre_op_bwd)


def fused_block_pair_pre(xa, xc, params_a, params_c, *, use_pallas=None, block_rows=None,
                         interpret=False, skip_input_grad=True):
    """Two pre chains (actor+critic) per row tile.  ``params_*`` =
    (w_in, b_in, ln1_scale, ln1_bias, w_qkv, b_qkv).  Returns
    (ha, hc, qkva, qkvc)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    block_rows = block_rows or _DEFAULT_BLOCK
    if use_pallas and kernel_mesh_status(xa.shape[0]) != (True, None):
        use_pallas = False
    with jax.named_scope("pair_pre"):
        return _pair_pre_op(xa, xc, tuple(params_a), tuple(params_c),
                            bool(use_pallas), block_rows, interpret, bool(skip_input_grad))


def _pair_post_fwd_kernel(activation, save, attna_ref, attnc_ref, ha_ref, hc_ref, *refs):
    pa = refs[0:8]  # w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down
    pc = refs[8:16]
    outs = refs[16:]
    outa_ref, outc_ref = outs[0], outs[1]
    saves = outs[2:] if save else (None,) * 4

    def chain(attn_ref, h_ref, params, out_ref, r1_ref, s_ref):
        w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down = params
        attn = attn_ref[...].astype(jnp.bfloat16)
        zo = jnp.dot(attn, w_o[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        r1 = h_ref[...] + (zo + b_o[...]).astype(jnp.bfloat16)
        y2, _, _ = _ln_fwd(r1.astype(jnp.float32), g2[...], bb2[...])
        z = jnp.dot(y2.astype(jnp.bfloat16), w_up[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        z1 = (z + b_up[...]).astype(jnp.bfloat16)
        hid = z1 if activation in ("identity", "none") else _act_kernel(activation, z1)
        f = jnp.dot(hid, w_down[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        out_ref[...] = r1 + (f + b_down[...]).astype(jnp.bfloat16)
        if save:
            r1_ref[...] = r1
            s_ref[...] = z1 if activation in _PREACT_ACTIVATIONS else hid

    chain(attna_ref, ha_ref, pa, outa_ref, saves[0], saves[2])
    chain(attnc_ref, hc_ref, pc, outc_ref, saves[1], saves[3])


def _pair_post_bwd_kernel(activation, attna_ref, attnc_ref, ga_ref, gc_ref,
                          r1a_ref, r1c_ref, sa_ref, sc_ref, *refs):
    wa = refs[0:5]   # w_o, w_up, w_down, g2, bb2
    wc = refs[5:10]
    outs = refs[10:]
    dattna_ref, dattnc_ref, dha_ref, dhc_ref = outs[0:4]
    douts_a = outs[4:12]   # dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down, db_down
    douts_c = outs[12:20]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (*douts_a, *douts_c):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    def chain_bwd(attn_ref, g_ref, r1_ref, s_ref, params, douts, dattn_ref, dh_ref):
        w_o, w_up, w_down, g2, bb2 = params
        dw_o_ref, db_o_ref, dg2_ref, dbb2_ref, dw_up_ref, db_up_ref, dw_down_ref, db_down_ref = douts
        g = g_ref[...].astype(jnp.float32)
        g_bf = g.astype(jnp.bfloat16)
        preact = activation in _PREACT_ACTIVATIONS
        saved = s_ref[...]
        if preact:
            hid = _act_kernel(activation, saved)
            dact = _dact_from_z(activation, saved.astype(jnp.float32))
        else:
            hid = saved
            dact = _dact_from_h(activation, saved.astype(jnp.float32))
        dw_down_ref[...] += _dot_nt(hid, g_bf)
        db_down_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        dhid = _dot_tn(g_bf, w_down[...].astype(jnp.bfloat16))
        dz1 = dhid * dact
        dz1_bf = dz1.astype(jnp.bfloat16)
        r1 = r1_ref[...]
        y2, xhat2, inv2 = _ln_fwd(r1.astype(jnp.float32), g2[...], bb2[...])
        dw_up_ref[...] += _dot_nt(y2.astype(jnp.bfloat16), dz1_bf)
        db_up_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
        dy2 = _dot_tn(dz1_bf, w_up[...].astype(jnp.bfloat16))
        dg2_ref[...] += jnp.sum(dy2 * xhat2, axis=0, keepdims=True)
        dbb2_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)
        dr1 = g + _ln_bwd(dy2, xhat2, inv2, g2[...])
        dr1_bf = dr1.astype(jnp.bfloat16)
        attn = attn_ref[...].astype(jnp.bfloat16)
        dw_o_ref[...] += _dot_nt(attn, dr1_bf)
        db_o_ref[...] += jnp.sum(dr1, axis=0, keepdims=True)
        dattn_ref[...] = _dot_tn(dr1_bf, w_o[...].astype(jnp.bfloat16))
        dh_ref[...] = dr1

    chain_bwd(attna_ref, ga_ref, r1a_ref, sa_ref, wa, douts_a, dattna_ref, dha_ref)
    chain_bwd(attnc_ref, gc_ref, r1c_ref, sc_ref, wc, douts_c, dattnc_ref, dhc_ref)


def _pair_post_run_fwd(attna, attnc, ha, hc, pa, pc, activation, block_rows, interpret, save):
    n = attna.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    embed, ff_dim = pa[0].shape[1], pa[4].shape[1]

    row_ins = [attna, attnc, ha, hc]
    in_specs = [_row_spec(a.shape[1], tb) for a in row_ins]
    in_specs += [_const_spec(a.shape) for a in pa] + [_const_spec(a.shape) for a in pc]
    out_specs = [_row_spec(embed, tb), _row_spec(embed, tb)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16)] * 2
    if save:
        out_specs += [_row_spec(embed, tb), _row_spec(embed, tb),
                      _row_spec(ff_dim, tb), _row_spec(ff_dim, tb)]
        out_shapes += [jax.ShapeDtypeStruct((n_pad, embed), jnp.bfloat16)] * 2
        out_shapes += [jax.ShapeDtypeStruct((n_pad, ff_dim), jnp.bfloat16)] * 2
    outs = pl.pallas_call(
        functools.partial(_pair_post_fwd_kernel, activation, save),
        grid=grid, in_specs=in_specs, out_specs=out_specs, out_shape=out_shapes,
        interpret=interpret,
    )(*[_pad_rows(a, n_pad) for a in row_ins], *pa, *pc)
    if save:
        return outs[0][:n], outs[1][:n], outs[2], outs[3], outs[4], outs[5]
    return outs[0][:n], outs[1][:n], None, None, None, None


def _pair_post_run_bwd(attna, attnc, ga, gc, r1a, r1c, sa, sc, wa, wc, activation, block_rows, interpret):
    n = attna.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    embed = wa[0].shape[1]

    row_ins = [attna, attnc, ga, gc, r1a, r1c, sa, sc]
    in_specs = [_row_spec(a.shape[1], tb) for a in row_ins]
    in_specs += [_const_spec(a.shape) for a in wa] + [_const_spec(a.shape) for a in wc]
    out_specs = [_row_spec(attna.shape[1], tb), _row_spec(attnc.shape[1], tb),
                 _row_spec(embed, tb), _row_spec(embed, tb)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, attna.shape[1]), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, attnc.shape[1]), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, embed), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, embed), jnp.float32),
    ]
    for w_o, w_up, w_down, g2, bb2 in (wa, wc):
        for shape in (w_o.shape, (1, w_o.shape[1]), g2.shape, bb2.shape,
                      w_up.shape, (1, w_up.shape[1]), w_down.shape, (1, w_down.shape[1])):
            out_specs.append(_const_spec(shape))
            out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_pair_post_bwd_kernel, activation),
        grid=grid, in_specs=in_specs, out_specs=out_specs, out_shape=out_shapes,
        interpret=interpret,
    )(*[_pad_rows(a, n_pad) for a in row_ins], *wa, *wc)
    dattna, dattnc, dha, dhc = outs[0][:n], outs[1][:n], outs[2][:n], outs[3][:n]
    return dattna, dattnc, dha, dhc, tuple(outs[4:12]), tuple(outs[12:20])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _pair_post_op(attna, attnc, ha, hc, pa, pc, activation, use_pallas, block_rows, interpret):
    if use_pallas:
        outa, outc, _, _, _, _ = _pair_post_run_fwd(
            attna, attnc, ha, hc, pa, pc, activation, block_rows, interpret, save=False
        )
        return outa, outc
    return (_post_reference(attna, ha, *pa, activation), _post_reference(attnc, hc, *pc, activation))


def _pair_post_op_fwd(attna, attnc, ha, hc, pa, pc, activation, use_pallas, block_rows, interpret):
    if use_pallas:
        outa, outc, r1a, r1c, sa, sc = _pair_post_run_fwd(
            attna, attnc, ha, hc, pa, pc, activation, block_rows, interpret, save=True
        )
        return (outa, outc), (attna, attnc, r1a, r1c, sa, sc, pa, pc, None, None)
    out = _pair_post_op(attna, attnc, ha, hc, pa, pc, activation, use_pallas, block_rows, interpret)
    return out, (attna, attnc, None, None, None, None, pa, pc, ha, hc)


def _pair_post_op_bwd(activation, use_pallas, block_rows, interpret, residuals, gs):
    attna, attnc, r1a, r1c, sa, sc, pa, pc, ha, hc = residuals
    ga, gc = gs
    if use_pallas:
        wa = (pa[0], pa[4], pa[6], pa[2], pa[3])  # w_o, w_up, w_down, g2, bb2
        wc = (pc[0], pc[4], pc[6], pc[2], pc[3])
        dattna, dattnc, dha, dhc, da, dc = _pair_post_run_bwd(
            attna, attnc, ga, gc, r1a, r1c, sa, sc, wa, wc, activation, block_rows, interpret
        )
        # Kernel grad order: dw_o, db_o, dg2, dbb2, dw_up, db_up, dw_down,
        # db_down == param order.
        return (dattna.astype(attna.dtype), dattnc.astype(attnc.dtype), dha, dhc, da, dc)

    def f(attna_, attnc_, ha_, hc_, pa_, pc_):
        return (_post_reference(attna_, ha_, *pa_, activation),
                _post_reference(attnc_, hc_, *pc_, activation))

    _, vjp = jax.vjp(f, attna, attnc, ha, hc, pa, pc)
    return vjp(gs)


_pair_post_op.defvjp(_pair_post_op_fwd, _pair_post_op_bwd)


# The pair POST bwd kernel carries BOTH chains' saved activations per row
# tile; at 1024 rows its scoped-VMEM stack sits within ~0.2 MB of the 16 MB
# limit, and whether it fits depends on the surrounding program's layout
# choices (it first OOM'd — by 180 KB — when the deferred-sequential value
# pass joined the fused iteration).  768 (~12 MB stack) keeps ~25% slack and
# measured FASTER than 512 on the transformer bench (1.782M vs 1.775M
# steps/s).  Override with CUSRL_TPU_TFBLOCK_PAIR_POST_ROWS.
def _pair_post_block() -> int:
    # Read per call (not at import) so sweep scripts/tests can override after
    # the module loads, matching the other knobs' lifetimes.
    return int(os.environ.get("CUSRL_TPU_TFBLOCK_PAIR_POST_ROWS", 0)) or min(_DEFAULT_BLOCK, 768)


def fused_block_pair_post(attna, attnc, ha, hc, params_a, params_c, activation="gelu", *,
                          use_pallas=None, block_rows=None, interpret=False):
    """Two post chains (actor+critic) per row tile.  ``params_*`` =
    (w_o, b_o, ln2_scale, ln2_bias, w_up, b_up, w_down, b_down)."""
    activation = activation.lower() if isinstance(activation, str) else activation
    if not supports_fused_block(activation):
        return (_post_reference(attna, ha, *params_a, activation),
                _post_reference(attnc, hc, *params_c, activation))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    block_rows = block_rows or _pair_post_block()
    if use_pallas and kernel_mesh_status(attna.shape[0]) != (True, None):
        use_pallas = False
    with jax.named_scope("pair_post"):
        return _pair_post_op(attna, attnc, ha, hc, tuple(params_a), tuple(params_c),
                             activation, bool(use_pallas), block_rows, interpret)
