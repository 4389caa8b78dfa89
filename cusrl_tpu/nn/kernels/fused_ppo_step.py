"""Single-invocation fused PPO train step: backbones + heads + loss + backward
in ONE Pallas kernel per minibatch.

The saved-activation pair kernel (fused_mlp.py) still pays for: the hidden
activations' HBM round trip between its forward and backward invocations, the
latent/cotangent round trips to the XLA loss ops, and the XLA head/loss tail
itself.  This kernel runs, per row tile, entirely in VMEM/registers:

    actor chain -> mean head (fp32) -> logp/ratio/clipped surrogate
    critic chain -> value head (fp32) -> (clipped) value regression
    analytic per-row loss gradients -> head + backbone gradient chains
    dW/db/dstd accumulated in fp32 across the sequential grid

Gradient integration preserves ``jax.value_and_grad`` over the hook composite:
the custom_vjp forward stores the parameter gradients of the COMBINED loss
(surrogate*w_s + value*w_v, weights passed as traced operands) as residuals;
the backward simply scales them by the loss cotangent — exact because
gradients are linear in the cotangent.  Loss math mirrors
hook/on_policy/{common,ppo,value}.py; the fp32 islands (mean head, value head,
logp) are preserved in-kernel.  Entropy for a state-independent-std Gaussian
depends only on ``std`` and stays in XLA (hook/on_policy/fused_update.py).

Reference loss math: cusrl/hook/on_policy/ppo.py:10-85, value.py:85-145,
common.py:12-49.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cusrl_tpu.nn.kernels.fused_mlp import (
    _act_kernel,
    _dact_from_h,
    _mesh_data_axes,
    _pad_rows,
    _reference,
)

__all__ = ["fused_ppo_step", "ppo_step_reference"]

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)

# Sweepable row tile (benchmarks/tpu_fused_ppo_check.py).  The mega-kernel
# holds BOTH chains' activations plus fp32 gradient accumulators per tile:
# 1024 rows exceeds the 16 MB scoped-VMEM limit at the bench shapes (measured
# 16.87 MB); 512 fits.
_DEFAULT_BLOCK_PPO = int(os.environ.get("CUSRL_TPU_PPO_BLOCK", 512))
# Split mode streams saved activations instead of holding both chains live, so
# it tolerates the pair kernels' preferred (larger) tile.
_DEFAULT_BLOCK_PPO_SPLIT = int(os.environ.get("CUSRL_TPU_PPO_BLOCK_SPLIT", 1024))


def _row_spec(dim, tb):
    return pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Pure-JAX reference (CPU fallback + correctness oracle).  Differentiable by
# ordinary autodiff; numerics identical to the standard hook trio.
# ---------------------------------------------------------------------------


def ppo_step_reference(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns,
    clip_ratio, w_surr, w_value, activation, trailing, loss_clip,
):
    la = _reference(xa, wsa, bsa, activation, trailing)
    lc = _reference(xc, wsc, bsc, activation, trailing)
    mean = la.astype(jnp.float32) @ wm + bm
    vhat = lc.astype(jnp.float32) @ wv + bv

    std = std.astype(jnp.float32)
    z = (action.astype(jnp.float32) - mean) / std
    logp = jnp.sum(-0.5 * jnp.square(z) - jnp.log(std) - _LOG_SQRT_2PI, axis=-1, keepdims=True)
    dlt = logp - old_logp.astype(jnp.float32)
    ratio = jnp.exp(dlt)
    adv = advantage.astype(jnp.float32)
    clipped = jnp.clip(ratio, 1.0 - clip_ratio, 1.0 + clip_ratio)
    surrogate = -jnp.minimum(adv * ratio, adv * clipped).mean()

    ret = returns.astype(jnp.float32)
    if loss_clip is None:
        value_loss = jnp.square(vhat - ret).mean()
    else:
        ov = old_value.astype(jnp.float32)
        clipped_v = ov + jnp.clip(vhat - ov, -loss_clip, loss_clip)
        value_loss = jnp.maximum(jnp.square(vhat - ret), jnp.square(clipped_v - ret)).mean()

    loss_core = w_surr * surrogate + w_value * value_loss
    metrics = {
        "surrogate_loss": jax.lax.stop_gradient(w_surr * surrogate),
        "value_loss": jax.lax.stop_gradient(w_value * value_loss),
        "ratio": jax.lax.stop_gradient(jnp.abs(dlt).mean()),
        "value": jax.lax.stop_gradient(vhat.sum(-1).mean()),
    }
    return loss_core, metrics


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _ppo_step_kernel(
    activation, trailing, nl, loss_clip, inv_n, inv_nv, use_old_value, num_rows, tile_rows,
    xa_ref, xc_ref, act_ref, olp_ref, adv_ref, ov_ref, ret_ref, *refs,
):
    wa = refs[:nl]
    ba = refs[nl : 2 * nl]
    wc = refs[2 * nl : 3 * nl]
    bc = refs[3 * nl : 4 * nl]
    wm_ref, bm_ref, wv_ref, bv_ref, std_ref, scal_ref = refs[4 * nl : 4 * nl + 6]
    outs = refs[4 * nl + 6 :]
    dwa = outs[:nl]
    dba = outs[nl : 2 * nl]
    dwc = outs[2 * nl : 3 * nl]
    dbc = outs[3 * nl : 4 * nl]
    (dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
     surr_ref, vloss_ref, absd_ref, vsum_ref) = outs[4 * nl : 4 * nl + 9]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (*dwa, *dba, *dwc, *dbc, dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
                    surr_ref, vloss_ref, absd_ref, vsum_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # ---- forward chains (activations stay in registers) --------------------
    def chain_fwd(x_ref, ws, bs):
        hs = []
        h = x_ref[...].astype(jnp.bfloat16)
        for i in range(nl):
            z = jnp.dot(h, ws[i][...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            z = (z + bs[i][...]).astype(jnp.bfloat16)
            h = _act_kernel(activation, z) if (i < nl - 1 or trailing) else z
            hs.append(h)
        return hs

    hs_a = chain_fwd(xa_ref, wa, ba)
    hs_c = chain_fwd(xc_ref, wc, bc)
    _loss_tail(
        activation, trailing, nl, loss_clip, inv_n, inv_nv, use_old_value, num_rows, tile_rows,
        xa_ref, xc_ref, act_ref, olp_ref, adv_ref, ov_ref, ret_ref,
        wa, wc, wm_ref, bm_ref, wv_ref, bv_ref, std_ref, scal_ref, hs_a, hs_c,
        dwa, dba, dwc, dbc, dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
        surr_ref, vloss_ref, absd_ref, vsum_ref,
    )


def _loss_tail(
    activation, trailing, nl, loss_clip, inv_n, inv_nv, use_old_value, num_rows, tile_rows,
    xa_ref, xc_ref, act_ref, olp_ref, adv_ref, ov_ref, ret_ref,
    wa, wc, wm_ref, bm_ref, wv_ref, bv_ref, std_ref, scal_ref, hs_a, hs_c,
    dwa, dba, dwc, dbc, dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
    surr_ref, vloss_ref, absd_ref, vsum_ref,
):
    """Heads + PPO/value loss + analytic backward over SAVED activations
    (``hs_a``/``hs_c`` are per-tile VALUES: h_1..h_{nl-1}, latent).  Shared by
    the mono kernel (activations from in-kernel forward) and the split
    loss-backward kernel (activations streamed from the saved-activation
    forward kernel)."""
    laf = hs_a[-1].astype(jnp.float32)
    lcf = hs_c[-1].astype(jnp.float32)

    mean = jnp.dot(laf, wm_ref[...], preferred_element_type=jnp.float32) + bm_ref[...]
    vhat = jnp.dot(lcf, wv_ref[...], preferred_element_type=jnp.float32) + bv_ref[...]

    std = std_ref[...]  # [1, A] fp32
    clip_ratio = scal_ref[0, 0]
    w_surr = scal_ref[0, 1]
    w_value = scal_ref[0, 2]

    # Padded tail rows (row count need not divide the tile): mask dlt to zero
    # BEFORE the exp so ratio stays 1.0 on pad rows — downstream terms then
    # vanish through the zero-padded advantage without inf*0 hazards.  Static:
    # no mask ops are emitted when the tile divides the row count.
    row_mask = None
    if num_rows % tile_rows:
        row_index = pl.program_id(0) * tile_rows + jax.lax.broadcasted_iota(
            jnp.int32, (tile_rows, 1), 0
        )
        row_mask = (row_index < num_rows).astype(jnp.float32)

    # ---- loss (fp32 island) ------------------------------------------------
    z = (act_ref[...] - mean) / std
    log_std = jnp.log(std)
    logp = jnp.sum(-0.5 * jnp.square(z) - log_std - _LOG_SQRT_2PI, axis=1, keepdims=True)
    dlt = logp - olp_ref[...]
    if row_mask is not None:
        dlt = dlt * row_mask
    ratio = jnp.exp(dlt)
    adv = adv_ref[...]
    lo, hi = 1.0 - clip_ratio, 1.0 + clip_ratio
    clipped = jnp.clip(ratio, lo, hi)
    t1 = adv * ratio
    t2 = adv * clipped
    surr_row = jnp.minimum(t1, t2)

    ret = ret_ref[...]
    if use_old_value:
        ov = ov_ref[...]
        delta = vhat - ov
        clipped_v = ov + jnp.clip(delta, -loss_clip, loss_clip)
        u = vhat - ret
        w = clipped_v - ret
        u2, w2 = jnp.square(u), jnp.square(w)
        vloss_el = jnp.maximum(u2, w2)
    else:
        u = vhat - ret
        vloss_el = jnp.square(u)

    if row_mask is not None:
        # surr_row is already zero on pad rows (zero-padded advantage); the
        # value terms and the vhat statistic are not.
        vloss_el = vloss_el * row_mask
        vhat_stat = vhat * row_mask
    else:
        vhat_stat = vhat

    # (1,1)-shaped stores: Mosaic cannot store scalars to VMEM.
    surr_ref[...] += jnp.sum(surr_row, keepdims=True)
    vloss_ref[...] += jnp.sum(vloss_el, keepdims=True)
    absd_ref[...] += jnp.sum(jnp.abs(dlt), keepdims=True)
    vsum_ref[...] += jnp.sum(vhat_stat, keepdims=True)

    # ---- analytic backward of loss_core = w_surr*(-mean surr) + w_value*mean vloss
    # surrogate: dL/d surr_row = -w_surr * inv_n; min picks t1 iff t1 <= t2
    # (matches jnp.minimum's tie convention), clip passes gradient inside
    # (lo <= r <= hi, matching jnp.clip's boundary convention).
    g_row = -w_surr * inv_n
    pick_t1 = t1 <= t2
    inside = jnp.logical_and(ratio >= lo, ratio <= hi).astype(jnp.float32)
    dsurr_dr = jnp.where(pick_t1, adv, adv * inside)
    # dlogp vanishes on pad rows through the zero-padded advantage factor.
    dlogp = (g_row * dsurr_dr) * ratio  # [tb, 1]
    dmean = dlogp * (z / std)  # [tb, A]
    dstd_ref[...] += jnp.sum(dlogp * ((jnp.square(z) - 1.0) / std), axis=0, keepdims=True)

    if use_old_value:
        # d max(u^2, w^2): argmax branch; w-branch passes through the inner
        # clip only where |delta| < loss_clip (outside, clipped_v is constant).
        pick_u = u2 >= w2
        w_inside = (jnp.abs(delta) <= loss_clip).astype(jnp.float32)
        dvhat = (w_value * inv_nv) * jnp.where(pick_u, 2.0 * u, 2.0 * w * w_inside)
    else:
        dvhat = (w_value * inv_nv) * (2.0 * u)
    if row_mask is not None:
        dvhat = dvhat * row_mask

    dwm_ref[...] += jax.lax.dot_general(laf, dmean, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbm_ref[...] += jnp.sum(dmean, axis=0, keepdims=True)
    da = jax.lax.dot_general(dmean, wm_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dwv_ref[...] += jax.lax.dot_general(lcf, dvhat, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbv_ref[...] += jnp.sum(dvhat, axis=0, keepdims=True)
    dc = jax.lax.dot_general(dvhat, wv_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def chain_bwd(x_ref, d, ws, hs, dws, dbs):
        for i in reversed(range(nl)):
            if i < nl - 1 or trailing:
                d = d * _dact_from_h(activation, hs[i].astype(jnp.float32))
            d_bf = d.astype(jnp.bfloat16)
            h_in = x_ref[...].astype(jnp.bfloat16) if i == 0 else hs[i - 1]
            dws[i][...] += jax.lax.dot_general(
                h_in, d_bf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dbs[i][...] += jnp.sum(d, axis=0, keepdims=True)
            if i == 0:
                break  # inputs are rollout data: no dX
            d = jax.lax.dot_general(
                d_bf, ws[i][...].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    chain_bwd(xa_ref, da, wa, hs_a, dwa, dba)
    chain_bwd(xc_ref, dc, wc, hs_c, dwc, dbc)


def _run_ppo_step(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns, scalars,
    activation, trailing, loss_clip, block_rows, interpret,
    n_total=None,
):
    n, nl = xa.shape[0], len(wsa)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    grid = (n_pad // tb,)
    a_dim, v_dim = wm.shape[1], wv.shape[1]
    use_old_value = loss_clip is not None
    # n_total: GLOBAL row count when running per-shard inside shard_map — the
    # per-row loss normalization must use it so psum'd accumulators are exact.
    inv_n = 1.0 / (n_total or n)
    inv_nv = 1.0 / ((n_total or n) * v_dim)

    # Pad every row operand to the tile multiple; the kernel masks the pad
    # rows' loss/gradient contributions (zero-padded advantage + explicit
    # value-term masks), so any row count works.
    #
    # Inputs and backbone weights ship as bf16: the kernel consumes them only
    # after an .astype(bf16) anyway, and the f32 copies were what pushed the
    # scoped-VMEM allocation past 16 MB at 1024-row tiles (measured 16.87 MB).
    xa, xc = xa.astype(jnp.bfloat16), xc.astype(jnp.bfloat16)
    wsa = tuple(w.astype(jnp.bfloat16) for w in wsa)
    wsc = tuple(w.astype(jnp.bfloat16) for w in wsc)
    old_value = old_value if use_old_value else jnp.zeros((n, v_dim), jnp.float32)
    operands = [xa, xc, action, old_logp, advantage, old_value, returns]
    if n_pad != n:
        operands = [_pad_rows(op, n_pad) for op in operands]
    in_specs = [
        _row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb),
        _row_spec(a_dim, tb), _row_spec(1, tb), _row_spec(1, tb),
        _row_spec(v_dim, tb), _row_spec(v_dim, tb),
    ]
    operands += [*wsa, *bsa, *wsc, *bsc, wm, bm, wv, bv, std, scalars]
    in_specs += [_const_spec(w.shape) for w in wsa] + [_const_spec(b.shape) for b in bsa]
    in_specs += [_const_spec(w.shape) for w in wsc] + [_const_spec(b.shape) for b in bsc]
    in_specs += [
        _const_spec(wm.shape), _const_spec(bm.shape), _const_spec(wv.shape), _const_spec(bv.shape),
        _const_spec(std.shape), _const_spec(scalars.shape),
    ]

    out_specs = []
    out_shapes = []
    for ws in (wsa, wsc):
        for w in ws:
            out_specs.append(_const_spec(w.shape))
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        for w in ws:
            out_specs.append(_const_spec((1, w.shape[1])))
            out_shapes.append(jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32))
    # dwa.., dba.., dwc.., dbc.. then heads/std/scalar sums:
    dw_specs_a = out_specs[: 2 * nl]
    dw_shapes_a = out_shapes[: 2 * nl]
    dw_specs_c = out_specs[2 * nl :]
    dw_shapes_c = out_shapes[2 * nl :]
    out_specs = dw_specs_a + dw_specs_c
    out_shapes = dw_shapes_a + dw_shapes_c
    for shape in (wm.shape, (1, a_dim), wv.shape, (1, v_dim), (1, a_dim), (1, 1), (1, 1), (1, 1), (1, 1)):
        out_specs.append(_const_spec(shape))
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(
            _ppo_step_kernel, activation, trailing, nl,
            0.0 if loss_clip is None else float(loss_clip), inv_n, inv_nv, use_old_value, n, tb,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)
    dwa = tuple(outs[:nl])
    dba = tuple(outs[nl : 2 * nl])
    dwc = tuple(outs[2 * nl : 3 * nl])
    dbc = tuple(outs[3 * nl : 4 * nl])
    dwm, dbm, dwv, dbv, dstd, surr_sum, vloss_sum, absd_sum, vsum = outs[4 * nl :]
    return (dwa, dba, dwc, dbc, dwm, dbm, dwv, dbv, dstd), (
        surr_sum[0, 0], vloss_sum[0, 0], absd_sum[0, 0], vsum[0, 0],
    )


# ---------------------------------------------------------------------------
# Split mode (default): the saved-activation PAIR forward kernel (fused_mlp,
# 76% MFU at its preferred tile) followed by ONE loss-backward kernel that
# consumes the saved activations — heads, loss math, and both gradient chains
# with no XLA tail.  The mono single-kernel variant above keeps everything in
# VMEM but its fwd+bwd tile pressure caps MFU at ~53% (measured on v5e:
# mono 0.471 ms/step vs split target ~0.34); kept for comparison via
# CUSRL_TPU_PPO_MODE=mono.
# ---------------------------------------------------------------------------


def _loss_bwd_kernel(
    activation, trailing, nl, loss_clip, inv_n, inv_nv, use_old_value, num_rows, tile_rows,
    xa_ref, xc_ref, act_ref, olp_ref, adv_ref, ov_ref, ret_ref, *refs,
):
    wa = refs[:nl]
    wc = refs[nl : 2 * nl]
    wm_ref, bm_ref, wv_ref, bv_ref, std_ref, scal_ref = refs[2 * nl : 2 * nl + 6]
    hs_a = [r[...] for r in refs[2 * nl + 6 : 3 * nl + 6]]
    hs_c = [r[...] for r in refs[3 * nl + 6 : 4 * nl + 6]]
    outs = refs[4 * nl + 6 :]
    dwa = outs[:nl]
    dba = outs[nl : 2 * nl]
    dwc = outs[2 * nl : 3 * nl]
    dbc = outs[3 * nl : 4 * nl]
    (dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
     surr_ref, vloss_ref, absd_ref, vsum_ref) = outs[4 * nl : 4 * nl + 9]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (*dwa, *dba, *dwc, *dbc, dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
                    surr_ref, vloss_ref, absd_ref, vsum_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    _loss_tail(
        activation, trailing, nl, loss_clip, inv_n, inv_nv, use_old_value, num_rows, tile_rows,
        xa_ref, xc_ref, act_ref, olp_ref, adv_ref, ov_ref, ret_ref,
        wa, wc, wm_ref, bm_ref, wv_ref, bv_ref, std_ref, scal_ref, hs_a, hs_c,
        dwa, dba, dwc, dbc, dwm_ref, dbm_ref, dwv_ref, dbv_ref, dstd_ref,
        surr_ref, vloss_ref, absd_ref, vsum_ref,
    )


def _run_loss_bwd(
    xa, xc, hs_a, hs_c, wsa, wsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns, scalars,
    activation, trailing, loss_clip, tb, interpret, n_total=None,
):
    """hs_a/hs_c: per-chain (h_1, ..., h_{nl-1}, latent), PADDED to the tile
    multiple (the forward kernel's layout); xa/xc and the loss rows are padded
    here to match."""
    n, nl = xa.shape[0], len(wsa)
    n_pad = hs_a[-1].shape[0]
    assert n_pad % tb == 0
    grid = (n_pad // tb,)
    a_dim, v_dim = wm.shape[1], wv.shape[1]
    use_old_value = loss_clip is not None
    inv_n = 1.0 / (n_total or n)
    inv_nv = 1.0 / ((n_total or n) * v_dim)

    old_value = old_value if use_old_value else jnp.zeros((n, v_dim), jnp.float32)
    rows = [xa, xc, action, old_logp, advantage, old_value, returns]
    if n_pad != n:
        rows = [_pad_rows(r, n_pad) for r in rows]
    operands = rows + [*wsa, *wsc, wm, bm, wv, bv, std, scalars, *hs_a, *hs_c]

    in_specs = [
        _row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb),
        _row_spec(a_dim, tb), _row_spec(1, tb), _row_spec(1, tb),
        _row_spec(v_dim, tb), _row_spec(v_dim, tb),
    ]
    in_specs += [_const_spec(w.shape) for w in wsa] + [_const_spec(w.shape) for w in wsc]
    in_specs += [
        _const_spec(wm.shape), _const_spec(bm.shape), _const_spec(wv.shape), _const_spec(bv.shape),
        _const_spec(std.shape), _const_spec(scalars.shape),
    ]
    in_specs += [_row_spec(h.shape[1], tb) for h in hs_a] + [_row_spec(h.shape[1], tb) for h in hs_c]

    out_specs = []
    out_shapes = []
    for ws in (wsa, wsc):
        for w in ws:
            out_specs.append(_const_spec(w.shape))
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        for w in ws:
            out_specs.append(_const_spec((1, w.shape[1])))
            out_shapes.append(jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32))
    dw_specs_a = out_specs[: 2 * nl]
    dw_shapes_a = out_shapes[: 2 * nl]
    dw_specs_c = out_specs[2 * nl :]
    dw_shapes_c = out_shapes[2 * nl :]
    out_specs = dw_specs_a + dw_specs_c
    out_shapes = dw_shapes_a + dw_shapes_c
    for shape in (wm.shape, (1, a_dim), wv.shape, (1, v_dim), (1, a_dim), (1, 1), (1, 1), (1, 1), (1, 1)):
        out_specs.append(_const_spec(shape))
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    outs = pl.pallas_call(
        functools.partial(
            _loss_bwd_kernel, activation, trailing, nl,
            0.0 if loss_clip is None else float(loss_clip), inv_n, inv_nv, use_old_value, n, tb,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)
    dwa = tuple(outs[:nl])
    dba = tuple(outs[nl : 2 * nl])
    dwc = tuple(outs[2 * nl : 3 * nl])
    dbc = tuple(outs[3 * nl : 4 * nl])
    dwm, dbm, dwv, dbv, dstd, surr_sum, vloss_sum, absd_sum, vsum = outs[4 * nl :]
    return (dwa, dba, dwc, dbc, dwm, dbm, dwv, dbv, dstd), (
        surr_sum[0, 0], vloss_sum[0, 0], absd_sum[0, 0], vsum[0, 0],
    )


_PPO_MODE = os.environ.get("CUSRL_TPU_PPO_MODE", "split")


def _run_step_any(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns, scalars,
    activation, trailing, loss_clip, block_rows, interpret, n_total=None,
):
    if _PPO_MODE == "mono":
        return _run_ppo_step(
            xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
            action, old_logp, advantage, old_value, returns, scalars,
            activation, trailing, loss_clip, block_rows, interpret, n_total=n_total,
        )
    from cusrl_tpu.nn.kernels.fused_mlp import _pair_run_fwd

    xa16, xc16 = xa.astype(jnp.bfloat16), xc.astype(jnp.bfloat16)
    wsa16 = tuple(w.astype(jnp.bfloat16) for w in wsa)
    wsc16 = tuple(w.astype(jnp.bfloat16) for w in wsc)
    n = xa.shape[0]
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    la, lc, ha, hc = _pair_run_fwd(
        xa16, xc16, wsa16, bsa, wsc16, bsc, activation, trailing, tb, interpret, save_hiddens=True
    )
    hs_a = tuple(ha) + (_pad_rows(la, n_pad),)
    hs_c = tuple(hc) + (_pad_rows(lc, n_pad),)
    return _run_loss_bwd(
        xa16, xc16, hs_a, hs_c, wsa16, wsc16, wm, bm, wv, bv, std,
        action, old_logp, advantage, old_value, returns, scalars,
        activation, trailing, loss_clip, tb, interpret, n_total=n_total,
    )


# ---------------------------------------------------------------------------
# custom_vjp wrapper: forward stores the combined-loss gradients as residuals;
# backward scales them by the loss cotangent (gradients are linear in it).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 21))
def _ppo_step_op(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns, scalars,
    activation, trailing, loss_clip, block_rows, interpret,
):
    out, _ = _ppo_step_fwd(
        xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
        action, old_logp, advantage, old_value, returns, scalars,
        activation, trailing, loss_clip, block_rows, interpret,
    )
    return out


def _ppo_step_fwd(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns, scalars,
    activation, trailing, loss_clip, block_rows, interpret,
):
    n = xa.shape[0]
    v_dim = wv.shape[1]
    grads, (surr_sum, vloss_sum, absd_sum, vsum) = _run_step_any(
        xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
        action, old_logp, advantage, old_value, returns, scalars,
        activation, trailing, loss_clip, block_rows, interpret,
    )
    w_surr, w_value = scalars[0, 1], scalars[0, 2]
    surrogate = -(surr_sum / n)
    value_loss = vloss_sum / (n * v_dim)
    loss_core = w_surr * surrogate + w_value * value_loss
    metrics = (
        w_surr * surrogate,  # surrogate_loss
        w_value * value_loss,  # value_loss
        absd_sum / n,  # ratio
        vsum / n,  # value
    )
    data_avals = (xa, xc, action, old_logp, advantage, old_value, returns, scalars)
    return (loss_core, metrics), (grads, data_avals)


def _ppo_step_bwd(activation, trailing, loss_clip, block_rows, interpret, residuals, gs):
    grads, data_avals = residuals
    dwa, dba, dwc, dbc, dwm, dbm, dwv, dbv, dstd = grads
    g = gs[0]  # cotangent of loss_core; metric cotangents are zeros by contract
    scale = lambda t: jax.tree.map(lambda x: x * g, t)
    # Rollout-data cotangents are structurally zero (and DCE'd by XLA).
    z_xa, z_xc, z_act, z_olp, z_adv, z_ov, z_ret, z_scal = (jnp.zeros_like(a) for a in data_avals)
    return (
        z_xa, z_xc,
        scale(tuple(dwa)), scale(tuple(dba)), scale(tuple(dwc)), scale(tuple(dbc)),
        scale(dwm), scale(dbm), scale(dwv), scale(dbv), scale(dstd),
        z_act, z_olp, z_adv, z_ov, z_ret, z_scal,
    )


_ppo_step_op.defvjp(_ppo_step_fwd, _ppo_step_bwd)


def _sharded_ppo_step_op(
    mesh, xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
    action, old_logp, advantage, old_value, returns, scalars,
    activation, trailing, loss_clip, block_rows, interpret,
):
    """Pure-DP shard_map wrapper: each device runs the mega-kernel on its row
    shard with GLOBAL loss normalization; the fp32 gradient/metric accumulators
    are psum'd inside the body (see fused_mlp._sharded_fused_mlp)."""
    from jax.sharding import PartitionSpec as P

    axes = _mesh_data_axes(mesh)
    row, rep = P(axes[0] if len(axes) == 1 else axes), P()
    n_total = xa.shape[0]
    v_dim = wv.shape[1]

    def run_sharded(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
                    action, old_logp, advantage, old_value, returns, scalars):
        def f(xa_, xc_, wsa_, bsa_, wsc_, bsc_, wm_, bm_, wv_, bv_, std_,
              action_, old_logp_, advantage_, old_value_, returns_, scalars_):
            grads, sums = _run_step_any(
                xa_, xc_, wsa_, bsa_, wsc_, bsc_, wm_, bm_, wv_, bv_, std_,
                action_, old_logp_, advantage_, old_value_, returns_, scalars_,
                activation, trailing, loss_clip, block_rows, interpret, n_total=n_total,
            )
            return jax.lax.psum((grads, sums), axes)

        in_specs = (row, row, rep, rep, rep, rep, rep, rep, rep, rep, rep,
                    row, row, row, row, row, rep)
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=rep, check_vma=False)(
            xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
            action, old_logp, advantage, old_value, returns, scalars,
        )

    def assemble(grads_sums, scalars):
        grads, (surr_sum, vloss_sum, absd_sum, vsum) = grads_sums
        w_surr, w_value = scalars[0, 1], scalars[0, 2]
        surrogate = -(surr_sum / n_total)
        value_loss = vloss_sum / (n_total * v_dim)
        loss_core = w_surr * surrogate + w_value * value_loss
        metrics = (w_surr * surrogate, w_value * value_loss, absd_sum / n_total, vsum / n_total)
        return (loss_core, metrics), grads

    @jax.custom_vjp
    def op(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
           action, old_logp, advantage, old_value, returns, scalars):
        gs = run_sharded(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
                         action, old_logp, advantage, old_value, returns, scalars)
        return assemble(gs, scalars)[0]

    def op_fwd(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
               action, old_logp, advantage, old_value, returns, scalars):
        gs = run_sharded(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
                         action, old_logp, advantage, old_value, returns, scalars)
        out, grads = assemble(gs, scalars)
        data_avals = (xa, xc, action, old_logp, advantage, old_value, returns, scalars)
        return out, (grads, data_avals)

    def op_bwd(residuals, gs):
        grads, data_avals = residuals
        dwa, dba, dwc, dbc, dwm, dbm, dwv, dbv, dstd = grads
        g = gs[0]
        scale = lambda t: jax.tree.map(lambda x: x * g, t)
        z_xa, z_xc, z_act, z_olp, z_adv, z_ov, z_ret, z_scal = (jnp.zeros_like(a) for a in data_avals)
        return (
            z_xa, z_xc,
            scale(tuple(dwa)), scale(tuple(dba)), scale(tuple(dwc)), scale(tuple(dbc)),
            scale(dwm), scale(dbm), scale(dwv), scale(dbv), scale(dstd),
            z_act, z_olp, z_adv, z_ov, z_ret, z_scal,
        )

    op.defvjp(op_fwd, op_bwd)
    return op(xa, xc, tuple(wsa), tuple(bsa), tuple(wsc), tuple(bsc), wm, bm, wv, bv, std,
              action, old_logp, advantage, old_value, returns, scalars)


def fused_ppo_step(
    xa, xc, weights_a, biases_a, weights_c, biases_c,
    mean_weight, mean_bias, value_weight, value_bias, std,
    action, old_logp, advantage, old_value, returns,
    clip_ratio, w_surr, w_value,
    activation: str = "elu",
    trailing: bool = True,
    *,
    loss_clip: float | None = None,
    use_pallas: bool | None = None,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Fused PPO+value train step.  Returns ``(loss_core, (surrogate_loss,
    value_loss, ratio, value))`` where ``loss_core = w_surr*surrogate +
    w_value*value_loss`` carries ALL parameter gradients (backbones, heads,
    ``std``) and the metric outputs are gradient-free.

    Weight layouts follow fused_mlp_pair_heads: backbone ``[in, out]`` +
    ``[1, out]`` biases, heads ``head.weight.T`` / ``bias[None, :]``; ``std``
    is the fp32 ``[1, A]`` state-independent deviation (its cotangent flows —
    chain it to ``std_param`` through the bijector in XLA).
    """
    activation = activation.lower() if isinstance(activation, str) else activation
    block_rows = block_rows or (_DEFAULT_BLOCK_PPO if _PPO_MODE == "mono" else _DEFAULT_BLOCK_PPO_SPLIT)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    wrap_mesh = None
    if use_pallas:
        from cusrl_tpu.nn.kernels.fused_mlp import kernel_mesh_status

        allowed, wrap_mesh = kernel_mesh_status(xa.shape[0])
        if not allowed:
            use_pallas = False
    old_logp = old_logp.reshape(-1, 1)
    advantage = advantage.reshape(-1, 1)
    if not use_pallas:
        loss_core, metrics = ppo_step_reference(
            xa, xc, tuple(weights_a), tuple(biases_a), tuple(weights_c), tuple(biases_c),
            mean_weight, mean_bias, value_weight, value_bias, std,
            action, old_logp, advantage, old_value, returns,
            clip_ratio, w_surr, w_value, activation, trailing, loss_clip,
        )
        return loss_core, (
            metrics["surrogate_loss"], metrics["value_loss"], metrics["ratio"], metrics["value"],
        )
    scalars = jnp.stack(
        [jnp.asarray(clip_ratio, jnp.float32), jnp.asarray(w_surr, jnp.float32),
         jnp.asarray(w_value, jnp.float32), jnp.zeros((), jnp.float32)]
    ).reshape(1, 4)
    op_args = (
        xa, xc, tuple(weights_a), tuple(biases_a), tuple(weights_c), tuple(biases_c),
        mean_weight, mean_bias, value_weight, value_bias,
        std.reshape(1, -1).astype(jnp.float32),
        action.astype(jnp.float32), old_logp.astype(jnp.float32), advantage.astype(jnp.float32),
        (old_value if old_value is not None else returns).astype(jnp.float32),
        returns.astype(jnp.float32), scalars,
    )
    if wrap_mesh is not None:
        loss_core, metrics = _sharded_ppo_step_op(
            wrap_mesh, *op_args, activation, trailing, loss_clip, block_rows, interpret
        )
    else:
        loss_core, metrics = _ppo_step_op(*op_args, activation, trailing, loss_clip, block_rows, interpret)
    metrics = jax.tree.map(jax.lax.stop_gradient, metrics)
    return loss_core, metrics
