"""Fused MLP forward+backward Pallas kernels — the train-step hot op.

The PPO update's dominant cost is fwd+bwd of small-layer MLP backbones over
very tall batches (e.g. 24576 × [48->512->256->128]).  As separate XLA matmuls
this runs at ~20% MFU: every layer boundary is a fusion boundary, activations
round-trip through HBM, and bf16<->fp32 casts add VPU traffic (measured in
benchmarks/profile_r2.py).  This kernel runs the whole chain per row-tile in
VMEM:

* **forward**: one grid step per row tile; all weights resident in VMEM; the
  only HBM traffic is the x tile in and the final activation tile out.
* **backward**: flash-style recompute — the forward chain is recomputed per
  tile (hidden activations never touch HBM), then the gradient chain runs in
  the same tile; dW/db accumulate in fp32 VMEM across the sequential grid.

Numerics mirror the Linear/Mlp XLA path (linear.py:84-96): matmuls take bf16
inputs with fp32 accumulation, bias is added in fp32, the result is cast to
bf16 and the activation runs in bf16.  Weight grads accumulate in fp32.

This replaces the fused-matmul role of ``torch.compile`` over the reference's
backbone (cusrl/template/agent.py:119) with an explicitly scheduled TPU kernel.
The XLA reference implementation below is the fallback (non-TPU platforms,
unsupported activations, higher-order autodiff) and the correctness oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mlp", "fused_mlp_pair", "fused_mlp_pair_heads", "supports_fused_mlp"]

# Sweepable defaults (benchmarks/tpu_fused_mlp_check.py): forward row tile and
# backward row tile.  The backward holds saved activations + fp32 dW/db
# accumulators in VMEM, so its tile is smaller.
_DEFAULT_BLOCK = int(os.environ.get("CUSRL_TPU_FUSED_BLOCK", 2048))
_DEFAULT_BLOCK_BWD = int(os.environ.get("CUSRL_TPU_FUSED_BLOCK_BWD", 1024))

_SUPPORTED_ACTIVATIONS = ("elu", "relu", "tanh", "gelu", "identity", "none")
# Activations whose derivative cannot be recovered from the OUTPUT: the
# kernels save the (bf16-rounded) PRE-activation z for these layers instead,
# recompute h = act(z) where the next layer's dW needs it (cheap elementwise,
# bit-identical to the forward), and differentiate from z directly.  Trailing
# use is unsupported (the final output slot doubles as the primal output).
_PREACT_ACTIVATIONS = ("gelu",)
_GELU_C = 0.7978845608028654  # sqrt(2/pi), jax.nn.gelu approximate=True


def _act(name: str, z):
    if name == "elu":
        return jax.nn.elu(z)
    if name == "relu":
        return jax.nn.relu(z)
    if name == "tanh":
        return jnp.tanh(z)
    if name == "gelu":
        return jax.nn.gelu(z)  # approximate (tanh) form, the jax default
    return z


def _act_kernel(name: str, zb):
    """In-kernel activation on the bf16-rounded pre-activation.  Computes in
    fp32 (Mosaic v5e rejects bf16 comparisons; expm1 has no lowering) and
    rounds back to bf16 — within 1 ulp of the XLA path's bf16 activation."""
    z = zb.astype(jnp.float32)
    if name == "elu":
        h = jnp.where(z > 0, z, jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    elif name == "relu":
        h = jnp.maximum(z, 0.0)
    elif name == "tanh":
        h = jnp.tanh(z)
    elif name == "gelu":
        h = 0.5 * z * (1.0 + jnp.tanh(_GELU_C * (z + 0.044715 * z * z * z)))
    else:
        h = z
    return h.astype(jnp.bfloat16)


def _dact_from_h(name: str, h):
    """Activation derivative from the POST-activation value (fp32) — the
    property that lets the backward kernel consume saved activations instead
    of recomputing the forward chain: elu' = min(h+1, 1), relu' = [h>0],
    tanh' = 1-h^2."""
    if name == "elu":
        return jnp.minimum(h + 1.0, 1.0)
    if name == "relu":
        return (h > 0).astype(jnp.float32)
    if name == "tanh":
        return 1.0 - h * h
    return jnp.ones_like(h)


def _dact_from_z(name: str, z):
    """Activation derivative from the saved PRE-activation (fp32) — for
    activations whose derivative is not a function of the output (gelu)."""
    if name == "gelu":
        u = _GELU_C * (z + 0.044715 * z * z * z)
        t = jnp.tanh(u)
        du = _GELU_C * (1.0 + 3.0 * 0.044715 * z * z)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du
    raise ValueError(f"activation '{name}' does not save pre-activations")


def supports_fused_mlp(activation: str, num_layers: int, trailing: bool = False) -> bool:
    if activation in _PREACT_ACTIVATIONS and trailing:
        return False  # the output slot holds the post-activation primal
    return activation in _SUPPORTED_ACTIVATIONS and num_layers >= 1


def kernel_mesh_status(rows: int) -> tuple[bool, "jax.sharding.AbstractMesh | None"]:
    """Whether the Pallas kernels may engage under the ambient mesh.

    Returns ``(allowed, wrap_mesh)``: ``wrap_mesh`` is the mesh to shard_map
    the kernel over (pure data parallelism, ``data`` axis > 1, rows divisible),
    or None when no wrapping is needed.  ``allowed=False`` whenever any
    non-``data`` axis is sharded (Pallas custom calls cannot partition the
    weights) or the rows don't divide — callers then keep the XLA chain, which
    XLA partitions itself.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # noqa: BLE001 - conservative under exotic contexts
        return True, None
    if mesh is None or getattr(mesh, "empty", True):
        return True, None
    shape = dict(mesh.shape)
    # Hierarchical (dcn, data) meshes are still pure data parallelism: the
    # kernels shard rows over BOTH axes (see _mesh_data_axes).
    data = shape.pop("data", 1) * shape.pop("dcn", 1)
    if any(size != 1 for size in shape.values()):
        _warn_tp_fallback(mesh)
        return False, None
    if data == 1:
        return True, None
    if rows % data:
        return False, None
    return True, mesh


_tp_fallback_warned = False


def _warn_tp_fallback(mesh) -> None:
    """Loud one-time notice that model-axis sharding drops the Pallas kernels
    (VERDICT r4 item 6): Pallas custom calls cannot partition weights over a
    NamedSharding, so any TP mesh silently ran the XLA chain before this.  The
    measured cost on one chip is the kernel-vs-chain gap (~45% vs 79% MFU on
    the MLP pair, docs/ROOFLINE.md); TP deployments should expect it."""
    global _tp_fallback_warned
    if _tp_fallback_warned:
        return
    _tp_fallback_warned = True
    import warnings

    warnings.warn(
        f"Model-axis sharding on mesh {dict(mesh.shape)} disables the fused Pallas kernels "
        "(custom calls cannot partition weights); falling back to the XLA chain, which XLA "
        "partitions itself at ~45% vs ~79% kernel MFU on the MLP pair (docs/ROOFLINE.md). "
        "Pure-DP and hierarchical (dcn, data) meshes keep the kernels via shard_map.",
        stacklevel=3,
    )


def _mesh_data_axes(mesh) -> tuple[str, ...]:
    """Row-sharding axes for the shard_map kernel wrappers: the combined
    ``(dcn, data)`` partition on hierarchical meshes, else ``("data",)``."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


# ---------------------------------------------------------------------------
# XLA reference (fallback + correctness oracle) — matches Mlp/Linear numerics.
# ---------------------------------------------------------------------------


def _reference(x, weights, biases, activation: str, trailing: bool):
    h = x
    last = len(weights) - 1
    for i, (w, b) in enumerate(zip(weights, biases)):
        z = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        if b is not None:
            z = z + b
        z = z.astype(jnp.bfloat16)
        h = _act(activation, z) if (i < last or trailing) else z
    return h


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(activation, trailing, num_layers, save_hiddens, x_ref, *refs):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers : 2 * num_layers]
    out_ref = refs[2 * num_layers]
    h_refs = refs[2 * num_layers + 1 :]  # saved activations h_1..h_{n-1}
    h = x_ref[...].astype(jnp.bfloat16)
    for i in range(num_layers):
        z = jnp.dot(h, w_refs[i][...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        z = (z + b_refs[i][...]).astype(jnp.bfloat16)
        zb = z
        h = _act_kernel(activation, z) if (i < num_layers - 1 or trailing) else z
        if save_hiddens and i < num_layers - 1:
            h_refs[i][...] = zb if activation in _PREACT_ACTIVATIONS else h
    out_ref[...] = h


def _bwd_kernel(activation, trailing, num_layers, x_ref, g_ref, *refs):
    w_refs = refs[:num_layers]
    h_refs = refs[num_layers : 2 * num_layers]  # h_1..h_{n-1}, out (= h_n)
    dx_ref = refs[2 * num_layers]
    dw_refs = refs[2 * num_layers + 1 : 3 * num_layers + 1]
    db_refs = refs[3 * num_layers + 1 : 4 * num_layers + 1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(num_layers):
            dw_refs[i][...] = jnp.zeros(dw_refs[i].shape, dw_refs[i].dtype)
            db_refs[i][...] = jnp.zeros(db_refs[i].shape, db_refs[i].dtype)

    # Gradient chain over the SAVED activations (no forward recompute).
    preact = activation in _PREACT_ACTIVATIONS
    d = g_ref[...].astype(jnp.float32)
    for i in reversed(range(num_layers)):
        if i < num_layers - 1 or trailing:
            saved = h_refs[i][...].astype(jnp.float32)
            d = d * (_dact_from_z(activation, saved) if preact else _dact_from_h(activation, saved))
        d_bf = d.astype(jnp.bfloat16)
        if i == 0:
            h_in = x_ref[...].astype(jnp.bfloat16)
        elif preact and i - 1 < num_layers - 1:
            h_in = _act_kernel(activation, h_refs[i - 1][...])  # bit-identical to fwd
        else:
            h_in = h_refs[i - 1][...]
        dw_refs[i][...] += jax.lax.dot_general(
            h_in, d_bf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        db_refs[i][...] += jnp.sum(d, axis=0, keepdims=True)
        d = jax.lax.dot_general(
            d_bf, w_refs[i][...].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[...] = d


def _pad_rows(a, rows):
    pad = rows - a.shape[0]
    return a if pad == 0 else jnp.pad(a, ((0, pad), (0, 0)))


def _run_fwd(x, weights, biases, activation, trailing, block_rows, interpret, save_hiddens=True):
    """Returns (out[:n], hiddens) — hiddens are the PADDED h_1..h_{n-1} saved
    for the backward kernel (padding rows are dead there: g is zero-padded).
    ``save_hiddens=False`` (primal-only calls: rollout explore, deferred value
    passes, KL statistics) skips those outputs entirely — they are dead HBM
    writes when no backward pass will consume them."""
    n, num_layers = x.shape[0], len(weights)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    xp = _pad_rows(x, n_pad)
    grid = (n_pad // tb,)
    out_dim = weights[-1].shape[1]

    in_specs = [pl.BlockSpec((tb, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in biases:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((tb, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, out_dim), jnp.bfloat16)]
    if save_hiddens:
        for w in weights[:-1]:
            out_specs.append(pl.BlockSpec((tb, w.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((n_pad, w.shape[1]), jnp.bfloat16))

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, activation, trailing, num_layers, save_hiddens),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, *weights, *biases)
    return outs[0][:n], tuple(outs[1:])


def _run_bwd(x, g, weights, hiddens, out, activation, trailing, block_rows, interpret):
    n, num_layers = x.shape[0], len(weights)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    xp = _pad_rows(x, n_pad)
    # Keep the cotangent's native dtype (often bf16 — the primal out is bf16):
    # upcasting host-side materializes a full [rows, width] fp32 copy that the
    # kernel would only re-read; the kernel upcasts per tile in-register.
    gp = _pad_rows(g, n_pad)
    out_p = _pad_rows(out, n_pad)
    grid = (n_pad // tb,)
    hs = tuple(hiddens) + (out_p,)  # h_1..h_n, all padded to n_pad

    in_specs = [
        pl.BlockSpec((tb, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, g.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for h in hs:
        in_specs.append(pl.BlockSpec((tb, h.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((tb, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((n_pad, x.shape[1]), jnp.float32)]
    for w in weights:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((1, w.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32))
    # Reorder: dws then dbs (kernel expects dw block then db block).
    dw_specs = out_specs[1::2]; db_specs = out_specs[2::2]
    dw_shapes = out_shapes[1::2]; db_shapes = out_shapes[2::2]
    out_specs = [out_specs[0]] + dw_specs + db_specs
    out_shapes = [out_shapes[0]] + dw_shapes + db_shapes

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, activation, trailing, num_layers),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, gp, *weights, *hs)
    dx = outs[0][:n]
    dws = tuple(outs[1 : 1 + num_layers])
    dbs = tuple(outs[1 + num_layers :])
    return dx, dws, dbs


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _fused_op(x, weights, biases, activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret):
    if use_pallas:
        return _run_fwd(x, weights, biases, activation, trailing, block_rows, interpret, save_hiddens=False)[0]
    return _reference(x, weights, biases, activation, trailing)


def _fused_op_fwd(x, weights, biases, activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret):
    if use_pallas:
        # Grad-path forward (saves hiddens -> 3x the VMEM of the primal):
        # tile at the backward's (smaller) block size.
        out, hiddens = _run_fwd(x, weights, biases, activation, trailing, block_rows_bwd or block_rows, interpret)
        return out, (x, weights, None, hiddens, out)
    out = _reference(x, weights, biases, activation, trailing)
    return out, (x, weights, biases, None, None)


def _fused_op_bwd(activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, residuals, g):
    x, weights, biases, hiddens, out = residuals
    if use_pallas:
        dx, dws, dbs = _run_bwd(x, g, weights, hiddens, out, activation, trailing, block_rows_bwd or block_rows, interpret)
        dbs = tuple(db.reshape(1, -1) for db in dbs)
    else:
        _, vjp = jax.vjp(lambda x_, ws_, bs_: _reference(x_, ws_, bs_, activation, trailing), x, weights, biases)
        dx, dws, dbs = vjp(g)
    return dx.astype(x.dtype), tuple(dws), tuple(dbs)


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


# ---------------------------------------------------------------------------
# Mesh-aware (pure-DP) wrappers: each device runs the kernel on its row shard
# via shard_map; weight/bias gradients are explicitly psum'd over ``data`` in
# the backward body (replicated-parameter DDP semantics — the TPU equivalent
# of the reference's flat-tensor all-reduce, cusrl/utils/distributed.py:145-172,
# but fused into the kernel's gradient path).  This is what lets the single-
# chip kernel MFU carry to multi-chip DP runs instead of reverting to XLA.
# ---------------------------------------------------------------------------


def _sharded_fused_mlp(mesh, x, weights, biases, activation, trailing, block_rows, block_rows_bwd, interpret):
    from jax.sharding import PartitionSpec as P

    axes = _mesh_data_axes(mesh)
    row, rep = P(axes[0] if len(axes) == 1 else axes), P()
    nl = len(weights)

    @jax.custom_vjp
    def op(x, weights, biases):
        def f(x_, ws_, bs_):
            return _run_fwd(x_, ws_, bs_, activation, trailing, block_rows, interpret, save_hiddens=False)[0]

        return jax.shard_map(f, mesh=mesh, in_specs=(row, rep, rep), out_specs=row, check_vma=False)(
            x, weights, biases
        )

    def op_fwd(x, weights, biases):
        def f(x_, ws_, bs_):
            return _run_fwd(x_, ws_, bs_, activation, trailing, block_rows_bwd or block_rows, interpret)

        out, hiddens = jax.shard_map(
            f, mesh=mesh, in_specs=(row, rep, rep), out_specs=(row, row), check_vma=False
        )(x, weights, biases)
        return out, (x, weights, hiddens, out)

    def op_bwd(residuals, g):
        x, weights, hiddens, out = residuals

        def f(x_, g_, ws_, hs_, out_):
            dx, dws, dbs = _run_bwd(
                x_, g_, ws_, hs_, out_, activation, trailing, block_rows_bwd or block_rows, interpret
            )
            dws, dbs = jax.lax.psum((dws, dbs), axes)
            return dx, dws, dbs

        dx, dws, dbs = jax.shard_map(
            f, mesh=mesh, in_specs=(row, row, rep, row, row), out_specs=(row, rep, rep), check_vma=False
        )(x, g, weights, hiddens, out)
        return dx.astype(x.dtype), tuple(dws), tuple(dbs)

    op.defvjp(op_fwd, op_bwd)
    del nl
    return op(x, tuple(weights), tuple(biases))


def fused_mlp(
    x,
    weights,
    biases,
    activation: str = "elu",
    trailing: bool = True,
    *,
    use_pallas: bool | None = None,
    block_rows: int | None = None,
    block_rows_bwd: int | None = None,
    interpret: bool = False,
):
    """Runs the full linear+activation chain as one fused op.

    ``weights[i]`` has kernel layout ``[in, out]``; ``biases[i]`` is ``[1, out]``
    (fp32).  Returns bf16 ``[N, out_last]``.  ``use_pallas=None`` auto-selects
    the Pallas kernel on TPU backends and the XLA reference elsewhere.
    """
    activation = activation.lower() if isinstance(activation, str) else activation
    if not supports_fused_mlp(activation, len(weights), trailing):
        return _reference(x, weights, biases, activation, trailing)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    block_rows = block_rows or _DEFAULT_BLOCK
    block_rows_bwd = block_rows_bwd or _DEFAULT_BLOCK_BWD
    if use_pallas:
        allowed, wrap_mesh = kernel_mesh_status(x.shape[0])
        if not allowed:
            use_pallas = False
        elif wrap_mesh is not None:
            return _sharded_fused_mlp(
                wrap_mesh, x, weights, biases, activation, trailing, block_rows, block_rows_bwd, interpret
            )
    return _fused_op(
        x, tuple(weights), tuple(biases), activation, trailing, bool(use_pallas), block_rows, block_rows_bwd, interpret
    )


# ---------------------------------------------------------------------------
# Paired variant: actor+critic chains in ONE kernel invocation per row tile
# (halves pipeline ramps; shares the input tile when both nets read the same
# observation).  Dims must match between the two networks (the PPO presets
# construct same-shape actor/critic backbones).
# ---------------------------------------------------------------------------


def _pair_fwd_kernel(activation, trailing, nl, save_hiddens, xa_ref, xc_ref, *refs):
    wa = refs[:nl]
    ba = refs[nl : 2 * nl]
    wc = refs[2 * nl : 3 * nl]
    bc = refs[3 * nl : 4 * nl]
    out_refs = refs[4 * nl :]  # out_a, out_c, ha_1.., hc_1..

    def chain(x_ref, ws, bs, out_ref, h_refs):
        h = x_ref[...].astype(jnp.bfloat16)
        for i in range(nl):
            z = jnp.dot(h, ws[i][...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            z = (z + bs[i][...]).astype(jnp.bfloat16)
            zb = z
            h = _act_kernel(activation, z) if (i < nl - 1 or trailing) else z
            if save_hiddens and i < nl - 1:
                h_refs[i][...] = zb if activation in _PREACT_ACTIVATIONS else h
        out_ref[...] = h

    if save_hiddens:
        chain(xa_ref, wa, ba, out_refs[0], out_refs[2 : 2 + (nl - 1)])
        chain(xc_ref, wc, bc, out_refs[1], out_refs[2 + (nl - 1) :])
    else:
        chain(xa_ref, wa, ba, out_refs[0], ())
        chain(xc_ref, wc, bc, out_refs[1], ())


def _pair_bwd_kernel(activation, trailing, nl, skip_input_grad, xa_ref, xc_ref, ga_ref, gc_ref, *refs):
    wa = refs[:nl]
    wc = refs[nl : 2 * nl]
    ha = refs[2 * nl : 3 * nl]  # h_1..h_{n-1}, out
    hc = refs[3 * nl : 4 * nl]
    refs = refs[4 * nl :]
    if skip_input_grad:
        dxa_ref = dxc_ref = None
    else:
        dxa_ref, dxc_ref = refs[0], refs[1]
        refs = refs[2:]
    dwa = refs[:nl]
    dba = refs[nl : 2 * nl]
    dwc = refs[2 * nl : 3 * nl]
    dbc = refs[3 * nl : 4 * nl]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (*dwa, *dba, *dwc, *dbc):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    def chain_bwd(x_ref, g_ref, ws, hs, dx_ref, dws, dbs):
        preact = activation in _PREACT_ACTIVATIONS
        d = g_ref[...].astype(jnp.float32)
        for i in reversed(range(nl)):
            if i < nl - 1 or trailing:
                saved = hs[i][...].astype(jnp.float32)
                d = d * (_dact_from_z(activation, saved) if preact else _dact_from_h(activation, saved))
            d_bf = d.astype(jnp.bfloat16)
            if i == 0:
                h_in = x_ref[...].astype(jnp.bfloat16)
            elif preact and i - 1 < nl - 1:
                h_in = _act_kernel(activation, hs[i - 1][...])
            else:
                h_in = hs[i - 1][...]
            dws[i][...] += jax.lax.dot_general(
                h_in, d_bf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dbs[i][...] += jnp.sum(d, axis=0, keepdims=True)
            if i == 0 and dx_ref is None:
                # Input cotangent unused by the caller (observations are data,
                # not parameters): skip the first layer's dX matmul + write.
                break
            d = jax.lax.dot_general(
                d_bf, ws[i][...].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if dx_ref is not None:
            dx_ref[...] = d

    chain_bwd(xa_ref, ga_ref, wa, ha, dxa_ref, dwa, dba)
    chain_bwd(xc_ref, gc_ref, wc, hc, dxc_ref, dwc, dbc)


def _row_spec(dim, tb):
    return pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pair_run_fwd(xa, xc, wsa, bsa, wsc, bsc, activation, trailing, block_rows, interpret, save_hiddens=True):
    n, nl = xa.shape[0], len(wsa)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    xa_p, xc_p = _pad_rows(xa, n_pad), _pad_rows(xc, n_pad)
    grid = (n_pad // tb,)
    out_dim = wsa[-1].shape[1]

    in_specs = [_row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb)]
    in_specs += [_const_spec(w.shape) for w in wsa] + [_const_spec(b.shape) for b in bsa]
    in_specs += [_const_spec(w.shape) for w in wsc] + [_const_spec(b.shape) for b in bsc]

    out_specs = [_row_spec(out_dim, tb), _row_spec(out_dim, tb)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, out_dim), jnp.bfloat16),
        jax.ShapeDtypeStruct((n_pad, out_dim), jnp.bfloat16),
    ]
    if save_hiddens:
        for ws in (wsa, wsc):
            for w in ws[:-1]:
                out_specs.append(_row_spec(w.shape[1], tb))
                out_shapes.append(jax.ShapeDtypeStruct((n_pad, w.shape[1]), jnp.bfloat16))

    outs = pl.pallas_call(
        functools.partial(_pair_fwd_kernel, activation, trailing, nl, save_hiddens),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xa_p, xc_p, *wsa, *bsa, *wsc, *bsc)
    out_a, out_c = outs[0][:n], outs[1][:n]
    ha = tuple(outs[2 : 2 + nl - 1])
    hc = tuple(outs[2 + nl - 1 :])
    return out_a, out_c, ha, hc


def _pair_run_bwd(
    xa, xc, ga, gc, wsa, wsc, ha, hc, outa, outc, activation, trailing, block_rows, interpret,
    skip_input_grad=False,
):
    n, nl = xa.shape[0], len(wsa)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    xa_p, xc_p = _pad_rows(xa, n_pad), _pad_rows(xc, n_pad)
    # Native-dtype cotangents (see _run_bwd): the kernel upcasts per tile.
    ga_p = _pad_rows(ga, n_pad)
    gc_p = _pad_rows(gc, n_pad)
    hs_a = tuple(ha) + (_pad_rows(outa, n_pad),)
    hs_c = tuple(hc) + (_pad_rows(outc, n_pad),)
    grid = (n_pad // tb,)

    in_specs = [
        _row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb),
        _row_spec(ga.shape[1], tb), _row_spec(gc.shape[1], tb),
    ]
    in_specs += [_const_spec(w.shape) for w in wsa] + [_const_spec(w.shape) for w in wsc]
    in_specs += [_row_spec(h.shape[1], tb) for h in hs_a] + [_row_spec(h.shape[1], tb) for h in hs_c]

    out_specs = []
    out_shapes = []
    if not skip_input_grad:
        out_specs += [_row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb)]
        out_shapes += [
            jax.ShapeDtypeStruct((n_pad, xa.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, xc.shape[1]), jnp.float32),
        ]
    for ws in (wsa, wsc):
        for w in ws:
            out_specs.append(_const_spec(w.shape))
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        for w in ws:
            out_specs.append(_const_spec((1, w.shape[1])))
            out_shapes.append(jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32))
    # Kernel order: [dxa, dxc,] dwa.., dba.., dwc.., dbc..

    outs = pl.pallas_call(
        functools.partial(_pair_bwd_kernel, activation, trailing, nl, skip_input_grad),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xa_p, xc_p, ga_p, gc_p, *wsa, *wsc, *hs_a, *hs_c)
    if skip_input_grad:
        dxa, dxc = jnp.zeros_like(xa), jnp.zeros_like(xc)
    else:
        dxa, dxc = outs[0][:n], outs[1][:n]
        outs = outs[2:]
    dwa = tuple(outs[:nl])
    dba = tuple(outs[nl : 2 * nl])
    dwc = tuple(outs[2 * nl : 3 * nl])
    dbc = tuple(outs[3 * nl : 4 * nl])
    return dxa, dxc, dwa, dba, dwc, dbc


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _pair_op(xa, xc, wsa, bsa, wsc, bsc, activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, skip_input_grad):
    if use_pallas:
        out_a, out_c, _, _ = _pair_run_fwd(
            xa, xc, wsa, bsa, wsc, bsc, activation, trailing, block_rows, interpret, save_hiddens=False
        )
        return out_a, out_c
    return (
        _reference(xa, wsa, bsa, activation, trailing),
        _reference(xc, wsc, bsc, activation, trailing),
    )


def _pair_op_fwd(xa, xc, wsa, bsa, wsc, bsc, activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, skip_input_grad):
    if use_pallas:
        # The saved-activation forward can run at ITS optimal (larger) tile
        # whenever the row count divides it — the backward re-tiles the saved
        # [n, d] arrays at its own block freely.  Only when padding would occur
        # must the two agree (the pad rows live in the saved arrays).
        bwd_tile = block_rows_bwd or block_rows
        fwd_tile = block_rows if xa.shape[0] % block_rows == 0 else bwd_tile
        out_a, out_c, ha, hc = _pair_run_fwd(
            xa, xc, wsa, bsa, wsc, bsc, activation, trailing, fwd_tile, interpret
        )
        return (out_a, out_c), (xa, xc, wsa, wsc, None, None, ha, hc, out_a, out_c)
    outs = _pair_op(
        xa, xc, wsa, bsa, wsc, bsc, activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret,
        skip_input_grad,
    )
    return outs, (xa, xc, wsa, wsc, bsa, bsc, None, None, None, None)


def _pair_op_bwd(activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, skip_input_grad, residuals, gs):
    xa, xc, wsa, wsc, bsa, bsc, ha, hc, outa, outc = residuals
    ga, gc = gs
    if use_pallas:
        dxa, dxc, dwa, dba, dwc, dbc = _pair_run_bwd(
            xa, xc, ga, gc, wsa, wsc, ha, hc, outa, outc, activation, trailing, block_rows_bwd or block_rows,
            interpret, skip_input_grad=skip_input_grad,
        )
        return dxa.astype(xa.dtype), dxc.astype(xc.dtype), dwa, tuple(dba), dwc, tuple(dbc)

    def f(xa_, xc_, wsa_, bsa_, wsc_, bsc_):
        return (
            _reference(xa_, wsa_, bsa_, activation, trailing),
            _reference(xc_, wsc_, bsc_, activation, trailing),
        )

    _, vjp = jax.vjp(f, xa, xc, wsa, bsa, wsc, bsc)
    return vjp((ga, gc))


_pair_op.defvjp(_pair_op_fwd, _pair_op_bwd)


def _sharded_pair_op(
    mesh, xa, xc, wsa, bsa, wsc, bsc, activation, trailing, block_rows, block_rows_bwd, interpret, skip_input_grad
):
    """Pure-DP shard_map wrapper of the pair kernel (see _sharded_fused_mlp)."""
    from jax.sharding import PartitionSpec as P

    axes = _mesh_data_axes(mesh)
    row, rep = P(axes[0] if len(axes) == 1 else axes), P()

    @jax.custom_vjp
    def op(xa, xc, wsa, bsa, wsc, bsc):
        def f(xa_, xc_, wsa_, bsa_, wsc_, bsc_):
            return _pair_run_fwd(
                xa_, xc_, wsa_, bsa_, wsc_, bsc_, activation, trailing, block_rows, interpret,
                save_hiddens=False,
            )[:2]

        return jax.shard_map(
            f, mesh=mesh, in_specs=(row, row, rep, rep, rep, rep), out_specs=(row, row), check_vma=False
        )(xa, xc, wsa, bsa, wsc, bsc)

    def op_fwd(xa, xc, wsa, bsa, wsc, bsc):
        def f(xa_, xc_, wsa_, bsa_, wsc_, bsc_):
            return _pair_run_fwd(
                xa_, xc_, wsa_, bsa_, wsc_, bsc_, activation, trailing,
                block_rows_bwd or block_rows, interpret,
            )

        out_a, out_c, ha, hc = jax.shard_map(
            f, mesh=mesh, in_specs=(row, row, rep, rep, rep, rep),
            out_specs=(row, row, row, row), check_vma=False,
        )(xa, xc, wsa, bsa, wsc, bsc)
        return (out_a, out_c), (xa, xc, wsa, wsc, ha, hc, out_a, out_c)

    def op_bwd(residuals, gs):
        xa, xc, wsa, wsc, ha, hc, out_a, out_c = residuals
        ga, gc = gs

        def f(xa_, xc_, ga_, gc_, wsa_, wsc_, ha_, hc_, outa_, outc_):
            dxa, dxc, dwa, dba, dwc, dbc = _pair_run_bwd(
                xa_, xc_, ga_, gc_, wsa_, wsc_, ha_, hc_, outa_, outc_, activation, trailing,
                block_rows_bwd or block_rows, interpret, skip_input_grad=skip_input_grad,
            )
            dwa, dba, dwc, dbc = jax.lax.psum((dwa, dba, dwc, dbc), axes)
            return dxa, dxc, dwa, dba, dwc, dbc

        dxa, dxc, dwa, dba, dwc, dbc = jax.shard_map(
            f, mesh=mesh,
            in_specs=(row, row, row, row, rep, rep, row, row, row, row),
            out_specs=(row, row, rep, rep, rep, rep), check_vma=False,
        )(xa, xc, ga, gc, wsa, wsc, ha, hc, out_a, out_c)
        return dxa.astype(xa.dtype), dxc.astype(xc.dtype), tuple(dwa), tuple(dba), tuple(dwc), tuple(dbc)

    op.defvjp(op_fwd, op_bwd)
    return op(xa, xc, tuple(wsa), tuple(bsa), tuple(wsc), tuple(bsc))


def fused_mlp_pair(
    xa,
    xc,
    weights_a,
    biases_a,
    weights_c,
    biases_c,
    activation: str = "elu",
    trailing: bool = True,
    *,
    use_pallas: bool | None = None,
    block_rows: int | None = None,
    block_rows_bwd: int | None = None,
    interpret: bool = False,
    skip_input_grad: bool = False,
):
    """Runs two same-shape linear+activation chains (actor+critic) as ONE
    fused op — one kernel invocation per row tile for both networks.

    ``skip_input_grad=True`` declares that the caller never uses the cotangent
    w.r.t. ``xa``/``xc`` (they are rollout data, not parameters): the backward
    kernel then skips the first layer's dX matmul and returns zeros for it."""
    activation = activation.lower() if isinstance(activation, str) else activation
    assert len(weights_a) == len(weights_c)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    block_rows = block_rows or _DEFAULT_BLOCK
    block_rows_bwd = block_rows_bwd or _DEFAULT_BLOCK_BWD
    if use_pallas:
        allowed, wrap_mesh = kernel_mesh_status(xa.shape[0])
        if not allowed:
            use_pallas = False
        elif wrap_mesh is not None:
            return _sharded_pair_op(
                wrap_mesh, xa, xc, weights_a, biases_a, weights_c, biases_c,
                activation, trailing, block_rows, block_rows_bwd, interpret, bool(skip_input_grad),
            )
    with jax.named_scope("mlp_pair"):
        return _pair_op(
            xa, xc, tuple(weights_a), tuple(biases_a), tuple(weights_c), tuple(biases_c),
            activation, trailing, bool(use_pallas), block_rows, block_rows_bwd, interpret, bool(skip_input_grad),
        )


# ---------------------------------------------------------------------------
# Head-fused paired variant: backbone chains PLUS the (fp32) distribution-mean
# and value heads in the same kernel.  The [rows, latent] activations never
# touch HBM in either direction — the XLA side only sees [rows, action_dim]
# fp32 means and [rows, 1] fp32 values, exactly what the loss hooks consume.
# fp32-island parity: heads compute as latent.astype(f32) @ W_f32 + b, matching
# LinearFp32 / Value.head (nn/layer/linear.py compute_dtype=None).
# ---------------------------------------------------------------------------


def _heads_reference(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, activation, trailing, expose_latent):
    la = _reference(xa, wsa, bsa, activation, trailing)
    lc = _reference(xc, wsc, bsc, activation, trailing)
    mean = la.astype(jnp.float32) @ wm + bm
    value = lc.astype(jnp.float32) @ wv + bv
    if expose_latent:
        return mean, value, la
    return mean, value


def _pair_heads_fwd_kernel(activation, trailing, nl, save, xa_ref, xc_ref, *refs):
    wa = refs[:nl]
    ba = refs[nl : 2 * nl]
    wc = refs[2 * nl : 3 * nl]
    bc = refs[3 * nl : 4 * nl]
    wm_ref, bm_ref, wv_ref, bv_ref = refs[4 * nl : 4 * nl + 4]
    outs = refs[4 * nl + 4 :]
    mean_ref, value_ref = outs[0], outs[1]
    if save:
        la_ref, lc_ref = outs[2], outs[3]
        ha_refs = outs[4 : 4 + (nl - 1)]
        hc_refs = outs[4 + (nl - 1) :]
    else:
        la_ref = lc_ref = None
        ha_refs = hc_refs = ()

    def chain(x_ref, ws, bs, h_refs):
        h = x_ref[...].astype(jnp.bfloat16)
        for i in range(nl):
            z = jnp.dot(h, ws[i][...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            z = (z + bs[i][...]).astype(jnp.bfloat16)
            zb = z
            h = _act_kernel(activation, z) if (i < nl - 1 or trailing) else z
            if save and i < nl - 1:
                h_refs[i][...] = zb if activation in _PREACT_ACTIVATIONS else h
        return h

    la = chain(xa_ref, wa, ba, ha_refs)
    lc = chain(xc_ref, wc, bc, hc_refs)
    if save:
        la_ref[...] = la
        lc_ref[...] = lc
    mean_ref[...] = (
        jnp.dot(la.astype(jnp.float32), wm_ref[...], preferred_element_type=jnp.float32) + bm_ref[...]
    )
    value_ref[...] = (
        jnp.dot(lc.astype(jnp.float32), wv_ref[...], preferred_element_type=jnp.float32) + bv_ref[...]
    )


def _pair_heads_bwd_kernel(
    activation, trailing, nl, expose_latent, skip_input_grad, xa_ref, xc_ref, gm_ref, gv_ref, *refs
):
    if expose_latent:
        gl_ref, refs = refs[0], refs[1:]
    else:
        gl_ref = None
    wa = refs[:nl]
    wc = refs[nl : 2 * nl]
    wm_ref, wv_ref = refs[2 * nl], refs[2 * nl + 1]
    ha = refs[2 * nl + 2 : 3 * nl + 2]  # h_1..h_{nl-1}, latent_a
    hc = refs[3 * nl + 2 : 4 * nl + 2]
    outs = refs[4 * nl + 2 :]
    if skip_input_grad:
        dxa_ref = dxc_ref = None
    else:
        dxa_ref, dxc_ref = outs[0], outs[1]
        outs = outs[2:]
    dwa = outs[:nl]
    dba = outs[nl : 2 * nl]
    dwc = outs[2 * nl : 3 * nl]
    dbc = outs[3 * nl : 4 * nl]
    dwm_ref, dbm_ref, dwv_ref, dbv_ref = outs[4 * nl : 4 * nl + 4]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (*dwa, *dba, *dwc, *dbc, dwm_ref, dbm_ref, dwv_ref, dbv_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    # Head backward (fp32 island), then the backbone gradient chains.
    la = ha[nl - 1][...].astype(jnp.float32)
    lc = hc[nl - 1][...].astype(jnp.float32)
    dmean = gm_ref[...]
    dvalue = gv_ref[...]
    dwm_ref[...] += jax.lax.dot_general(la, dmean, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbm_ref[...] += jnp.sum(dmean, axis=0, keepdims=True)
    da = jax.lax.dot_general(dmean, wm_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if gl_ref is not None:
        da = da + gl_ref[...]
    dwv_ref[...] += jax.lax.dot_general(lc, dvalue, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbv_ref[...] += jnp.sum(dvalue, axis=0, keepdims=True)
    # Single-output value head: the latent cotangent is an outer product,
    # cheaper on the VPU than a K=1 matmul.  Multi-reward critics
    # (value_dim > 1) need the real contraction.
    if wv_ref.shape[1] == 1:
        dc = dvalue * wv_ref[...].reshape(1, -1)
    else:
        dc = jax.lax.dot_general(
            dvalue, wv_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def chain_bwd(x_ref, d, ws, hs, dx_ref, dws, dbs):
        preact = activation in _PREACT_ACTIVATIONS
        for i in reversed(range(nl)):
            if i < nl - 1 or trailing:
                saved = hs[i][...].astype(jnp.float32)
                d = d * (_dact_from_z(activation, saved) if preact else _dact_from_h(activation, saved))
            d_bf = d.astype(jnp.bfloat16)
            if i == 0:
                h_in = x_ref[...].astype(jnp.bfloat16)
            elif preact and i - 1 < nl - 1:
                h_in = _act_kernel(activation, hs[i - 1][...])
            else:
                h_in = hs[i - 1][...]
            dws[i][...] += jax.lax.dot_general(
                h_in, d_bf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dbs[i][...] += jnp.sum(d, axis=0, keepdims=True)
            if i == 0 and dx_ref is None:
                break
            d = jax.lax.dot_general(
                d_bf, ws[i][...].astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if dx_ref is not None:
            dx_ref[...] = d

    chain_bwd(xa_ref, da, wa, ha, dxa_ref, dwa, dba)
    chain_bwd(xc_ref, dc, wc, hc, dxc_ref, dwc, dbc)


def _pair_heads_run_fwd(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, activation, trailing, block_rows, interpret, save
):
    n, nl = xa.shape[0], len(wsa)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    xa_p, xc_p = _pad_rows(xa, n_pad), _pad_rows(xc, n_pad)
    grid = (n_pad // tb,)
    latent_dim = wsa[-1].shape[1]
    a_dim, v_dim = wm.shape[1], wv.shape[1]

    in_specs = [_row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb)]
    in_specs += [_const_spec(w.shape) for w in wsa] + [_const_spec(b.shape) for b in bsa]
    in_specs += [_const_spec(w.shape) for w in wsc] + [_const_spec(b.shape) for b in bsc]
    in_specs += [_const_spec(wm.shape), _const_spec(bm.shape), _const_spec(wv.shape), _const_spec(bv.shape)]

    out_specs = [_row_spec(a_dim, tb), _row_spec(v_dim, tb)]
    out_shapes = [
        jax.ShapeDtypeStruct((n_pad, a_dim), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, v_dim), jnp.float32),
    ]
    if save:
        out_specs += [_row_spec(latent_dim, tb), _row_spec(latent_dim, tb)]
        out_shapes += [
            jax.ShapeDtypeStruct((n_pad, latent_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_pad, latent_dim), jnp.bfloat16),
        ]
        for ws in (wsa, wsc):
            for w in ws[:-1]:
                out_specs.append(_row_spec(w.shape[1], tb))
                out_shapes.append(jax.ShapeDtypeStruct((n_pad, w.shape[1]), jnp.bfloat16))

    outs = pl.pallas_call(
        functools.partial(_pair_heads_fwd_kernel, activation, trailing, nl, save),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xa_p, xc_p, *wsa, *bsa, *wsc, *bsc, wm, bm, wv, bv)
    mean, value = outs[0][:n], outs[1][:n]
    if not save:
        return mean, value, None, None, (), ()
    la, lc = outs[2], outs[3]
    ha = tuple(outs[4 : 4 + nl - 1])
    hc = tuple(outs[4 + nl - 1 :])
    return mean, value, la, lc, ha, hc


def _pair_heads_run_bwd(
    xa, xc, gm, gv, gl, wsa, wsc, wm, wv, ha, hc, la, lc,
    activation, trailing, block_rows, interpret, expose_latent, skip_input_grad,
):
    n, nl = xa.shape[0], len(wsa)
    tb = min(block_rows, max(8, -(-n // 8) * 8))
    n_pad = -(-n // tb) * tb
    xa_p, xc_p = _pad_rows(xa, n_pad), _pad_rows(xc, n_pad)
    gm_p = _pad_rows(gm.astype(jnp.float32), n_pad)
    gv_p = _pad_rows(gv.astype(jnp.float32), n_pad)
    hs_a = tuple(ha) + (la,)
    hs_c = tuple(hc) + (lc,)
    grid = (n_pad // tb,)

    operands = [xa_p, xc_p, gm_p, gv_p]
    in_specs = [
        _row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb),
        _row_spec(gm.shape[1], tb), _row_spec(gv.shape[1], tb),
    ]
    if expose_latent:
        gl_p = _pad_rows(gl.astype(jnp.float32), n_pad)
        operands.append(gl_p)
        in_specs.append(_row_spec(gl.shape[1], tb))
    operands += [*wsa, *wsc, wm, wv, *hs_a, *hs_c]
    in_specs += [_const_spec(w.shape) for w in wsa] + [_const_spec(w.shape) for w in wsc]
    in_specs += [_const_spec(wm.shape), _const_spec(wv.shape)]
    in_specs += [_row_spec(h.shape[1], tb) for h in hs_a] + [_row_spec(h.shape[1], tb) for h in hs_c]

    out_specs = []
    out_shapes = []
    if not skip_input_grad:
        out_specs += [_row_spec(xa.shape[1], tb), _row_spec(xc.shape[1], tb)]
        out_shapes += [
            jax.ShapeDtypeStruct((n_pad, xa.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, xc.shape[1]), jnp.float32),
        ]
    for ws in (wsa, wsc):
        for w in ws:
            out_specs.append(_const_spec(w.shape))
            out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        for w in ws:
            out_specs.append(_const_spec((1, w.shape[1])))
            out_shapes.append(jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32))
    out_specs += [
        _const_spec(wm.shape), _const_spec((1, wm.shape[1])),
        _const_spec(wv.shape), _const_spec((1, wv.shape[1])),
    ]
    out_shapes += [
        jax.ShapeDtypeStruct(wm.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, wm.shape[1]), jnp.float32),
        jax.ShapeDtypeStruct(wv.shape, jnp.float32),
        jax.ShapeDtypeStruct((1, wv.shape[1]), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_pair_heads_bwd_kernel, activation, trailing, nl, expose_latent, skip_input_grad),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*operands)
    if skip_input_grad:
        dxa, dxc = jnp.zeros_like(xa), jnp.zeros_like(xc)
    else:
        dxa, dxc = outs[0][:n], outs[1][:n]
        outs = outs[2:]
    dwa = tuple(outs[:nl])
    dba = tuple(outs[nl : 2 * nl])
    dwc = tuple(outs[2 * nl : 3 * nl])
    dbc = tuple(outs[3 * nl : 4 * nl])
    dwm, dbm, dwv, dbv = outs[4 * nl : 4 * nl + 4]
    return dxa, dxc, dwa, dba, dwc, dbc, dwm, dbm, dwv, dbv


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17))
def _pair_heads_op(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv,
    activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, expose_latent, skip_input_grad,
):
    if use_pallas:
        mean, value, la, _, _, _ = _pair_heads_run_fwd(
            xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, activation, trailing, block_rows, interpret,
            save=bool(expose_latent),
        )
        # la comes back padded to the row-tile multiple; truncate like the
        # vjp-fwd path does so primal-only calls agree with differentiated ones.
        return (mean, value, la[: xa.shape[0]]) if expose_latent else (mean, value)
    return _heads_reference(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, activation, trailing, expose_latent)


def _pair_heads_op_fwd(
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv,
    activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, expose_latent, skip_input_grad,
):
    if use_pallas:
        mean, value, la, lc, ha, hc = _pair_heads_run_fwd(
            xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, activation, trailing,
            block_rows_bwd or block_rows, interpret, save=True,
        )
        out = (mean, value, la[: xa.shape[0]]) if expose_latent else (mean, value)
        return out, (xa, xc, wsa, wsc, wm, wv, ha, hc, la, lc)
    out = _heads_reference(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, activation, trailing, expose_latent)
    return out, (xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv)


def _pair_heads_op_bwd(
    activation, trailing, use_pallas, block_rows, block_rows_bwd, interpret, expose_latent, skip_input_grad,
    residuals, gs,
):
    if use_pallas:
        xa, xc, wsa, wsc, wm, wv, ha, hc, la, lc = residuals
        if expose_latent:
            gm, gv, gl = gs
        else:
            (gm, gv), gl = gs, None
        dxa, dxc, dwa, dba, dwc, dbc, dwm, dbm, dwv, dbv = _pair_heads_run_bwd(
            xa, xc, gm, gv, gl, wsa, wsc, wm, wv, ha, hc, la, lc,
            activation, trailing, block_rows_bwd or block_rows, interpret, expose_latent, skip_input_grad,
        )
        return (
            dxa.astype(xa.dtype), dxc.astype(xc.dtype), dwa, tuple(dba), dwc, tuple(dbc),
            dwm, dbm, dwv, dbv,
        )
    xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv = residuals

    def f(xa_, xc_, wsa_, bsa_, wsc_, bsc_, wm_, bm_, wv_, bv_):
        return _heads_reference(xa_, xc_, wsa_, bsa_, wsc_, bsc_, wm_, bm_, wv_, bv_, activation, trailing, expose_latent)

    _, vjp = jax.vjp(f, xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv)
    return vjp(gs)


_pair_heads_op.defvjp(_pair_heads_op_fwd, _pair_heads_op_bwd)


def fused_mlp_pair_heads(
    xa,
    xc,
    weights_a,
    biases_a,
    weights_c,
    biases_c,
    mean_weight,
    mean_bias,
    value_weight,
    value_bias,
    activation: str = "elu",
    trailing: bool = True,
    *,
    use_pallas: bool | None = None,
    block_rows: int | None = None,
    block_rows_bwd: int | None = None,
    interpret: bool = False,
    expose_latent: bool = False,
    skip_input_grad: bool = True,
):
    """Backbone pair + fp32 heads in one kernel per row tile.

    Returns ``(mean [N, A] f32, value [N, Dv] f32)``; with
    ``expose_latent=True`` also returns the actor latent (bf16) so
    representation-learning hooks can attach probes — its cotangent flows back
    through the kernel.  ``mean_weight``/``value_weight`` take ``[in, out]``
    layout (pass ``head.weight.T``); biases are ``[1, out]`` fp32.
    """
    activation = activation.lower() if isinstance(activation, str) else activation
    assert len(weights_a) == len(weights_c)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and kernel_mesh_status(xa.shape[0]) != (True, None):
        # Head-fused variant has no shard_map wrapper (it measured slower than
        # the pair kernel anyway); under any mesh use the XLA reference, which
        # XLA partitions itself.
        use_pallas = False
    block_rows = block_rows or _DEFAULT_BLOCK
    block_rows_bwd = block_rows_bwd or _DEFAULT_BLOCK_BWD
    return _pair_heads_op(
        xa, xc, tuple(weights_a), tuple(biases_a), tuple(weights_c), tuple(biases_c),
        mean_weight, mean_bias, value_weight, value_bias,
        activation, trailing, bool(use_pallas), block_rows, block_rows_bwd, interpret,
        bool(expose_latent), bool(skip_input_grad),
    )
