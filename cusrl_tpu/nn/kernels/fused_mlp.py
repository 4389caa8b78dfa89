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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mlp", "supports_fused_mlp"]

_SUPPORTED_ACTIVATIONS = ("elu", "relu", "tanh", "identity", "none")


def _act(name: str, z):
    if name == "elu":
        return jax.nn.elu(z)
    if name == "relu":
        return jax.nn.relu(z)
    if name == "tanh":
        return jnp.tanh(z)
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


def supports_fused_mlp(activation: str, num_layers: int) -> bool:
    return activation in _SUPPORTED_ACTIVATIONS and num_layers >= 1


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


def _fwd_kernel(activation, trailing, num_layers, x_ref, *refs):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers : 2 * num_layers]
    out_ref = refs[2 * num_layers]
    h_refs = refs[2 * num_layers + 1 :]  # saved activations h_1..h_{n-1}
    h = x_ref[...].astype(jnp.bfloat16)
    for i in range(num_layers):
        z = jnp.dot(h, w_refs[i][...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        z = (z + b_refs[i][...]).astype(jnp.bfloat16)
        h = _act_kernel(activation, z) if (i < num_layers - 1 or trailing) else z
        if i < num_layers - 1:
            h_refs[i][...] = h
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
    d = g_ref[...].astype(jnp.float32)
    for i in reversed(range(num_layers)):
        if i < num_layers - 1 or trailing:
            d = d * _dact_from_h(activation, h_refs[i][...].astype(jnp.float32))
        d_bf = d.astype(jnp.bfloat16)
        h_in = x_ref[...].astype(jnp.bfloat16) if i == 0 else h_refs[i - 1][...]
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


def _run_fwd(x, weights, biases, activation, trailing, block_rows, interpret):
    """Returns (out[:n], hiddens) — hiddens are the PADDED h_1..h_{n-1} saved
    for the backward kernel (padding rows are dead there: g is zero-padded)."""
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
    for w in weights[:-1]:
        out_specs.append(pl.BlockSpec((tb, w.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n_pad, w.shape[1]), jnp.bfloat16))

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, activation, trailing, num_layers),
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
    gp = _pad_rows(g.astype(jnp.float32), n_pad)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_op(x, weights, biases, activation, trailing, use_pallas, block_rows, interpret):
    if use_pallas:
        return _run_fwd(x, weights, biases, activation, trailing, block_rows, interpret)[0]
    return _reference(x, weights, biases, activation, trailing)


def _fused_op_fwd(x, weights, biases, activation, trailing, use_pallas, block_rows, interpret):
    if use_pallas:
        out, hiddens = _run_fwd(x, weights, biases, activation, trailing, block_rows, interpret)
        return out, (x, weights, None, hiddens, out)
    out = _reference(x, weights, biases, activation, trailing)
    return out, (x, weights, biases, None, None)


def _fused_op_bwd(activation, trailing, use_pallas, block_rows, interpret, residuals, g):
    x, weights, biases, hiddens, out = residuals
    if use_pallas:
        dx, dws, dbs = _run_bwd(x, g, weights, hiddens, out, activation, trailing, block_rows, interpret)
        dbs = tuple(db.reshape(1, -1) for db in dbs)
    else:
        _, vjp = jax.vjp(lambda x_, ws_, bs_: _reference(x_, ws_, bs_, activation, trailing), x, weights, biases)
        dx, dws, dbs = vjp(g)
    return dx.astype(x.dtype), tuple(dws), tuple(dbs)


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def fused_mlp(
    x,
    weights,
    biases,
    activation: str = "elu",
    trailing: bool = True,
    *,
    use_pallas: bool | None = None,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Runs the full linear+activation chain as one fused op.

    ``weights[i]`` has kernel layout ``[in, out]``; ``biases[i]`` is ``[1, out]``
    (fp32).  Returns bf16 ``[N, out_last]``.  ``use_pallas=None`` auto-selects
    the Pallas kernel on TPU backends and the XLA reference elsewhere.
    """
    activation = activation.lower() if isinstance(activation, str) else activation
    if not supports_fused_mlp(activation, len(weights)):
        return _reference(x, weights, biases, activation, trailing)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return _fused_op(x, tuple(weights), tuple(biases), activation, trailing, bool(use_pallas), block_rows, interpret)
