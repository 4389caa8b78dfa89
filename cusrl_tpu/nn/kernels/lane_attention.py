"""Cross-env "lane" attention: the RL-shaped windowed-attention kernel.

TPU-native counterpart of the reference's flex_attention training path
(cusrl/nn/module/causal_attn.py:49-259) for the shapes on-policy RL actually
trains at: THOUSANDS of environments but TINY per-env attention problems
(T ≈ 8-64 query steps, S = W + T combined keys, D ≈ 16-64 head dims).

Why a second attention kernel (besides banded_attention): at these shapes
every per-(env, head) matmul is far below one 128×128 MXU tile, so both the
XLA SDPA chain and per-env-grid Pallas kernels (round 3's removed "micro-T"
kernel measured 5.49 ms vs XLA's 5.20 at the bench shapes) are bound by
per-micro-op latency (~90 ns; docs/ROADMAP.md round-3 tables) and by
HBM materialization of the padded [N, H, T, S→128] score tensors (traced at
~30 ms/iter on the transformer bench).  This kernel instead vectorizes ACROSS
ENVIRONMENTS: tensors are laid out env-minor (``[H, D, T, N]`` — environments
in the 128-wide vector lanes, time in sublanes) and the score/softmax/PV
chain becomes plain elementwise VPU arithmetic over [T, N] slabs:

    scores[j, t, n] = Σ_d q[d, t, n] · k[d, t+j, n]        (j = 0..W band)

— every operation is dense over 128 lanes, no per-env matmuls, no score
materialization in HBM, and the band parameterization (key index = t + j)
makes the causal∧window mask STRUCTURAL: only segment/validity masking
remains.  Forward saves the normalized probabilities; the backward kernel
consumes them with the same shifted-slab accumulation pattern.

Semantics are identical to ``banded_window_attention`` /
``scaled_dot_product_attention`` (fp32 math, all-invalid rows → exactly 0);
equality is enforced by tests/test_lane_attention.py against the masked-SDPA
reference and the scan cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lane_window_attention", "lane_next_token_attention"]


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple


# ---------------------------------------------------------------------------
# XLA reference (CPU path; also the equality oracle in tests)
# ---------------------------------------------------------------------------


def _lane_reference(q, k, v, q_seg, k_seg, k_valid, window: int, slopes):
    """q [N,H,T,D]; k/v [N,H,S,D]; q_seg [N,T]; k_seg/k_valid [N,S]; fp32 out.

    Plain masked SDPA over the combined key axis — the same math as
    CausalMultiheadSelfAttention._sequence_batched.
    """
    t_len, s_len = q.shape[-2], k.shape[-2]
    q_pos = window + jnp.arange(t_len)
    k_pos = jnp.arange(s_len)
    in_window = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] >= q_pos[:, None] - window)
    mask = (
        in_window[None]
        & (q_seg[:, :, None] == k_seg[:, None, :])
        & (k_valid[:, None, :] > 0)
    )[:, None]  # [N, 1, T, S]
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("nhtd,nhsd->nhts", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if slopes is not None:
        distance = (q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)
        scores = scores - jnp.asarray(slopes, jnp.float32)[None, :, None, None] * distance[None, None]
    scores = jnp.where(mask, scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    weights = jnp.where(jnp.any(mask, axis=-1, keepdims=True), weights, 0.0)
    return jnp.einsum("nhts,nhsd->nhtd", weights, v.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Env-minor layout plumbing
# ---------------------------------------------------------------------------


def _to_lane_layout(q, k, v, q_seg, k_seg, k_valid, window: int, lane_block: int):
    """[N, H, T|S, D] → env-minor padded tensors.

    Returns (q_em [H,D,T8,Np], k_em/v_em [H,D,S8,Np], q_seg_em [T8,Np],
    k_seg_em/k_valid_em [S8,Np], t8, n_pad).  Time is padded to a sublane
    multiple (8) with never-matching segments; the env axis to the lane block.
    """
    n, h, t_len, d = q.shape
    s_len = k.shape[2]
    t8 = _round_up(t_len, 8)
    s8 = window + t8  # band slices k[j : j + t8] for j ≤ W
    n_pad = _round_up(n, lane_block)

    def pad4(x, time_to):
        return jnp.pad(x, ((0, n_pad - n), (0, 0), (0, time_to - x.shape[2]), (0, 0)))

    def pad2(x, time_to, value):
        return jnp.pad(x, ((0, n_pad - n), (0, time_to - x.shape[1])), constant_values=value)

    q_em = jnp.transpose(pad4(q, t8), (1, 3, 2, 0))  # [H, D, T8, Np]
    k_em = jnp.transpose(pad4(k, s8), (1, 3, 2, 0))
    v_em = jnp.transpose(pad4(v, s8), (1, 3, 2, 0))
    # Padded queries get segment -2, padded keys -1: they never match.
    q_seg_em = jnp.transpose(pad2(q_seg.astype(jnp.int32), t8, -2), (1, 0))  # [T8, Np]
    k_seg_em = jnp.transpose(pad2(k_seg.astype(jnp.int32), s8, -1), (1, 0))
    k_valid_em = jnp.transpose(pad2(k_valid.astype(jnp.int32), s8, 0), (1, 0))
    return q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, t8, s8, n_pad


# ---------------------------------------------------------------------------
# Pallas kernels (grid = env-lane blocks; everything else lives in VMEM)
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, q_seg_ref, k_seg_ref, k_valid_ref, out_ref,
                w_ref=None, *, window: int, scale: float, slopes, save_weights: bool):
    # Per-(env-block, head) instance: refs carry a leading singleton head axis.
    _, dim, t8, _ = q_ref.shape
    band = window + 1
    h = 0  # head selected by the grid / BlockSpecs
    from jax.experimental import pallas as pl

    head_id = pl.program_id(1)
    q_seg = q_seg_ref[...]
    neg = jnp.float32(-1e30)

    # Band scores: j-th slab scores queries t against keys t+j (key t+j is
    # (W - j) steps in the past; j == W is the query itself).
    probs = []
    row_max = None
    masks = []
    for j in range(band):
        acc = jnp.zeros_like(q_seg, jnp.float32)  # [T8, NB]
        for d in range(dim):
            acc += q_ref[h, d].astype(jnp.float32) * k_ref[h, d, j : j + t8, :].astype(jnp.float32)
        acc = acc * scale
        if slopes is not None:
            # Scalar select over the static slope table (head is a grid dim;
            # Mosaic-safe — no dynamic gather needed).
            slope = sum(
                jnp.float32(s) * (head_id == i).astype(jnp.float32) for i, s in enumerate(slopes)
            )
            acc = acc - slope * jnp.float32(window - j)
        m = (k_seg_ref[j : j + t8, :] == q_seg) & (k_valid_ref[j : j + t8, :] > 0)
        acc = jnp.where(m, acc, neg)
        masks.append(m)
        probs.append(acc)
        row_max = acc if row_max is None else jnp.maximum(row_max, acc)
    denom = jnp.zeros_like(row_max)
    for j in range(band):
        p = jnp.where(masks[j], jnp.exp(probs[j] - row_max), 0.0)
        probs[j] = p
        denom = denom + p
    inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
    for j in range(band):
        p = probs[j] * inv
        probs[j] = p
        if save_weights:
            w_ref[h, j] = p
    for d in range(dim):
        acc = jnp.zeros_like(q_seg, jnp.float32)
        for j in range(band):
            acc += probs[j] * v_ref[h, d, j : j + t8, :].astype(jnp.float32)
        out_ref[h, d] = acc


def _bwd_kernel(q_ref, k_ref, v_ref, w_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, window: int, scale: float):
    # Per-(env-block, head) instance: refs carry a leading singleton head axis.
    _, dim, t8, _ = q_ref.shape
    band = window + 1
    h = 0

    dk_ref[...] = jnp.zeros_like(dk_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)
    w = [w_ref[h, j] for j in range(band)]
    # dv[s] += Σ_t w[t, j] g[t]  (s = t + j), and dw = g · v.
    dw = [jnp.zeros_like(w[0]) for _ in range(band)]
    for d in range(dim):
        g_d = g_ref[h, d].astype(jnp.float32)
        v_d = v_ref[h, d].astype(jnp.float32)
        for j in range(band):
            dv_ref[h, d, j : j + t8, :] += w[j] * g_d
            dw[j] = dw[j] + g_d * v_d[j : j + t8, :]
    # Softmax backward: ds = w ⊙ (dw − Σ_j dw·w), then rescale.
    rho = jnp.zeros_like(w[0])
    for j in range(band):
        rho = rho + dw[j] * w[j]
    ds = [(dw[j] - rho) * w[j] * jnp.float32(scale) for j in range(band)]
    # dq[t] = Σ_j ds[t, j] k[t+j];  dk[t+j] += ds[t, j] q[t].
    for d in range(dim):
        q_d = q_ref[h, d].astype(jnp.float32)
        k_d = k_ref[h, d].astype(jnp.float32)
        acc = jnp.zeros_like(q_d, jnp.float32)
        for j in range(band):
            acc += ds[j] * k_d[j : j + t8, :]
            dk_ref[h, d, j : j + t8, :] += ds[j] * q_d
        dq_ref[h, d] = acc


def _lane_pallas_fwd(q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em,
                     window: int, scale: float, slopes, lane_block: int, interpret: bool,
                     save_weights: bool):
    """``save_weights=False`` is the primal-only variant: XLA cannot DCE Pallas
    outputs, so value-eval/KL passes must not emit the [H, W+1, T, N] weight
    tensor as a dead HBM write (ROADMAP kernel-hygiene rule)."""
    from jax.experimental import pallas as pl

    heads, dim, t8, n_pad = q_em.shape
    s8 = k_em.shape[2]
    band = window + 1
    # One instance per (env lane-block, head): keeps double-buffered VMEM well
    # under the 16 MB scoped limit (an all-heads block OOM'd by 104 KB at the
    # bench shapes) and gives the pipeline more, smaller blocks to overlap.
    grid = (n_pad // lane_block, heads)
    kernel = functools.partial(
        _fwd_kernel, window=window, scale=scale, slopes=slopes, save_weights=save_weights
    )
    out_specs = [pl.BlockSpec((1, dim, t8, lane_block), lambda i, h: (h, 0, 0, i))]
    out_shape = [jax.ShapeDtypeStruct((heads, dim, t8, n_pad), jnp.float32)]
    if save_weights:
        out_specs.append(pl.BlockSpec((1, band, t8, lane_block), lambda i, h: (h, 0, 0, i)))
        out_shape.append(jax.ShapeDtypeStruct((heads, band, t8, n_pad), jnp.float32))
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dim, t8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((t8, lane_block), lambda i, h: (0, i)),
            pl.BlockSpec((s8, lane_block), lambda i, h: (0, i)),
            pl.BlockSpec((s8, lane_block), lambda i, h: (0, i)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em)
    if save_weights:
        return results[0], results[1]
    return results[0], None


def _lane_pallas_bwd(q_em, k_em, v_em, weights, g_em, window: int, scale: float,
                     lane_block: int, interpret: bool):
    from jax.experimental import pallas as pl

    heads, dim, t8, n_pad = q_em.shape
    s8 = k_em.shape[2]
    band = window + 1
    grid = (n_pad // lane_block, heads)
    kernel = functools.partial(_bwd_kernel, window=window, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dim, t8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, band, t8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, t8, lane_block), lambda i, h: (h, 0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, dim, t8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i)),
            pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((heads, dim, t8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((heads, dim, s8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((heads, dim, s8, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(q_em, k_em, v_em, weights, g_em)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Custom-VJP op over env-minor tensors (padding/transposes live OUTSIDE the op
# so the backward recovers every static shape from its residuals)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _lane_em_op(q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, window, slopes, lane_block):
    scale = 1.0 / float(np.sqrt(q_em.shape[1]))
    out_em, _ = _lane_pallas_fwd(
        q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, window, scale, slopes, lane_block,
        interpret=jax.default_backend() != "tpu", save_weights=False,
    )
    return out_em


def _lane_em_fwd(q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, window, slopes, lane_block):
    scale = 1.0 / float(np.sqrt(q_em.shape[1]))
    out_em, weights = _lane_pallas_fwd(
        q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, window, scale, slopes, lane_block,
        interpret=jax.default_backend() != "tpu", save_weights=True,
    )
    return out_em, (q_em, k_em, v_em, weights, q_seg_em, k_seg_em, k_valid_em)


def _lane_em_bwd(window, slopes, lane_block, residuals, g_em):
    q_em, k_em, v_em, weights, q_seg_em, k_seg_em, k_valid_em = residuals
    scale = 1.0 / float(np.sqrt(q_em.shape[1]))
    dq_em, dk_em, dv_em = _lane_pallas_bwd(
        q_em, k_em, v_em, weights, g_em.astype(jnp.float32), window, scale, lane_block,
        interpret=jax.default_backend() != "tpu",
    )
    float0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (
        dq_em.astype(q_em.dtype),
        dk_em.astype(k_em.dtype),
        dv_em.astype(v_em.dtype),
        float0(q_seg_em),
        float0(k_seg_em),
        float0(k_valid_em),
    )


_lane_em_op.defvjp(_lane_em_fwd, _lane_em_bwd)


def _next_fwd_kernel(q_ref, ks_ref, vs_ref, k_ref, v_ref, q_seg_ref, k_seg_ref, k_valid_ref,
                     out_ref, *, window: int, scale: float, slopes):
    """Counterfactual-append ("next token") attention: query t attends combined
    keys ``[t+1, W+t]`` (band slabs j = 1..W — the W tokens its ring would hold
    after writing y[t] over the oldest slot) PLUS its own k/v (``ks``/``vs``,
    the self key the single-step path writes before attending).  Same slab
    arithmetic as ``_fwd_kernel``; the self term is one extra elementwise slab
    with ALiBi distance 0.  Primal-only (bootstrap values are stop-gradient)."""
    _, dim, t8, _ = q_ref.shape
    from jax.experimental import pallas as pl

    h = 0
    head_id = pl.program_id(1)
    q_seg = q_seg_ref[...]
    neg = jnp.float32(-1e30)

    probs = []
    masks = []
    # Self slab first: always valid, distance 0.
    acc = jnp.zeros_like(q_seg, jnp.float32)
    for d in range(dim):
        acc += q_ref[h, d].astype(jnp.float32) * ks_ref[h, d].astype(jnp.float32)
    acc = acc * scale
    self_valid = q_seg > -2  # padded queries (seg -2) stay fully masked
    acc = jnp.where(self_valid, acc, neg)
    masks.append(self_valid)
    probs.append(acc)
    row_max = acc
    for j in range(1, window + 1):
        acc = jnp.zeros_like(q_seg, jnp.float32)
        for d in range(dim):
            acc += q_ref[h, d].astype(jnp.float32) * k_ref[h, d, j : j + t8, :].astype(jnp.float32)
        acc = acc * scale
        if slopes is not None:
            slope = sum(
                jnp.float32(s) * (head_id == i).astype(jnp.float32) for i, s in enumerate(slopes)
            )
            acc = acc - slope * jnp.float32(window + 1 - j)
        m = (k_seg_ref[j : j + t8, :] == q_seg) & (k_valid_ref[j : j + t8, :] > 0)
        acc = jnp.where(m, acc, neg)
        masks.append(m)
        probs.append(acc)
        row_max = jnp.maximum(row_max, acc)
    denom = jnp.zeros_like(row_max)
    for i in range(len(probs)):
        p = jnp.where(masks[i], jnp.exp(probs[i] - row_max), 0.0)
        probs[i] = p
        denom = denom + p
    inv = jnp.where(denom > 0, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
    for i in range(len(probs)):
        probs[i] = probs[i] * inv
    for d in range(dim):
        acc = probs[0] * vs_ref[h, d].astype(jnp.float32)
        for j in range(1, window + 1):
            acc += probs[j] * v_ref[h, d, j : j + t8, :].astype(jnp.float32)
        out_ref[h, d] = acc


def lane_next_token_attention(
    q,
    k_self,
    v_self,
    k,
    v,
    q_seg,
    k_seg,
    k_valid,
    *,
    window: int,
    slopes=None,
    lane_block: int | None = None,
    use_pallas: bool | None = None,
):
    """Counterfactual-append attention for next-token (bootstrap-value) queries.

    ``q``/``k_self``/``v_self`` ``[N, H, T, D]`` are the appended tokens'
    projections (q RoPE'd at positions ``W+t+1``); ``k``/``v`` ``[N, H, S, D]``
    are the VALUE pass's combined keys (cache ++ sequence, k RoPE'd at its
    combined positions).  Query t attends combined keys ``[t+1, W+t]`` under
    the same segment/validity masks as the value pass, plus its own k/v.
    Forward-only (bootstrap values are consumed under stop-gradient).
    Returns fp32 ``[N, H, T, D]``.
    """
    if lane_block is None:
        import os

        # Forward-only and carrying no saved-weights tensor, this kernel fits
        # larger env blocks than the grad-path lane kernel; its own knob
        # (CUSRL_TPU_NEXT_LANE_BLOCK) falls back to the shared one.
        env = os.environ.get("CUSRL_TPU_NEXT_LANE_BLOCK") or os.environ.get("CUSRL_TPU_LANE_BLOCK")
        lane_block = int(env) if env else (256 if q.shape[2] <= 32 and window <= 32 else 128)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    q_seg = q_seg.astype(jnp.int32)
    k_seg = k_seg.astype(jnp.int32)
    k_valid = k_valid.astype(jnp.int32)
    if not use_pallas:
        return _next_token_reference(q, k_self, v_self, k, v, q_seg, k_seg, k_valid, window, slopes)

    n, heads, t_len, dim = q.shape
    slopes_t = None if slopes is None else tuple(float(s) for s in np.asarray(slopes))
    q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, t8, s8, n_pad = _to_lane_layout(
        q, k, v, q_seg, k_seg, k_valid, window, lane_block
    )

    def pad_self(x):
        return jnp.transpose(
            jnp.pad(x, ((0, n_pad - n), (0, 0), (0, t8 - t_len), (0, 0))), (1, 3, 2, 0)
        )  # [H, D, T8, Np]

    ks_em, vs_em = pad_self(k_self), pad_self(v_self)
    from jax.experimental import pallas as pl

    scale = 1.0 / float(np.sqrt(dim))
    grid = (n_pad // lane_block, heads)
    kernel = functools.partial(_next_fwd_kernel, window=window, scale=scale, slopes=slopes_t)
    t_spec = pl.BlockSpec((1, dim, t8, lane_block), lambda i, h: (h, 0, 0, i))
    s_spec = pl.BlockSpec((1, dim, s8, lane_block), lambda i, h: (h, 0, 0, i))
    with jax.named_scope("lane_next_token"):
        out_em = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                t_spec, t_spec, t_spec, s_spec, s_spec,
                pl.BlockSpec((t8, lane_block), lambda i, h: (0, i)),
                pl.BlockSpec((s8, lane_block), lambda i, h: (0, i)),
                pl.BlockSpec((s8, lane_block), lambda i, h: (0, i)),
            ],
            out_specs=[t_spec],
            out_shape=[jax.ShapeDtypeStruct((heads, dim, t8, n_pad), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(q_em, ks_em, vs_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em)[0]
    return jnp.transpose(out_em, (3, 0, 2, 1))[:n, :, :t_len]  # [N, H, T, D]


def _next_token_reference(q, k_self, v_self, k, v, q_seg, k_seg, k_valid, window: int, slopes):
    """XLA oracle for lane_next_token_attention (also the off-TPU path): dense
    masked softmax over [band keys ++ self] with the self logit folded in."""
    t_len, s_len = q.shape[-2], k.shape[-2]
    q_pos = window + 1 + jnp.arange(t_len)
    k_pos = jnp.arange(s_len)
    in_band = (k_pos[None, :] <= q_pos[:, None] - 1) & (k_pos[None, :] >= q_pos[:, None] - window)
    mask = (
        in_band[None]
        & (q_seg[:, :, None] == k_seg[:, None, :])
        & (k_valid[:, None, :] > 0)
    )[:, None]  # [N, 1, T, S]
    scale = 1.0 / np.sqrt(q.shape[-1])
    q32 = q.astype(jnp.float32)
    scores = jnp.einsum("nhtd,nhsd->nhts", q32, k.astype(jnp.float32)) * scale
    if slopes is not None:
        distance = (q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)
        scores = scores - jnp.asarray(slopes, jnp.float32)[None, :, None, None] * distance[None, None]
    scores = jnp.where(mask, scores, -1e30)
    self_score = jnp.sum(q32 * k_self.astype(jnp.float32), axis=-1) * scale  # [N, H, T]
    row_max = jnp.maximum(jnp.max(scores, axis=-1), self_score)
    eb = jnp.exp(scores - row_max[..., None]) * mask
    es = jnp.exp(self_score - row_max)
    denom = jnp.sum(eb, axis=-1) + es
    out = jnp.einsum("nhts,nhsd->nhtd", eb, v.astype(jnp.float32))
    out = out + es[..., None] * v_self.astype(jnp.float32)
    return out / denom[..., None]


def lane_window_attention(
    q,
    k,
    v,
    q_seg,
    k_seg,
    k_valid,
    *,
    window: int,
    slopes=None,
    lane_block: int | None = None,
    use_pallas: bool | None = None,
):
    """Cross-env windowed segment-masked attention (short-T training shapes).

    Args:
      q: ``[N, H, T, D]`` queries (combined positions ``W + t``).
      k, v: ``[N, H, S, D]`` with ``S = W + T`` (cache ++ sequence).
      q_seg: ``[N, T]`` int episode-segment id per query step.
      k_seg: ``[N, S]`` int segment id per combined key (cache slots = 0).
      k_valid: ``[N, S]`` key validity (cache mask ++ ones).
      window: attention window W; query t sees combined keys ``[t, W+t]``.
      slopes: optional ``[H]`` ALiBi slopes (bias ``-slope·distance``).
      lane_block: environments per kernel instance (128-lane multiples).
      use_pallas: force the kernel (default: TPU backend only; the kernel also
        runs under ``interpret=True`` off-TPU when forced, for tests).

    Returns fp32 ``[N, H, T, D]``; rows with no valid key are exactly zero.
    """
    if lane_block is None:
        import os

        # Env-block sweep knob: instances process ``lane_block`` envs each
        # (128-lane multiples); larger blocks mean fewer pipeline ramps.
        # 256 measured +0.9% on the transformer bench at T=24 (1.798M vs
        # 1.782M steps/s, fwd AND bwd in-program); T>=64 shapes OOM the 16 MB
        # scoped VMEM at 256 (round-5 sweep) so the default stays 128 there.
        env = os.environ.get("CUSRL_TPU_LANE_BLOCK")
        lane_block = int(env) if env else (256 if q.shape[2] <= 32 and window <= 32 else 128)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    q_seg = q_seg.astype(jnp.int32)
    k_seg = k_seg.astype(jnp.int32)
    k_valid = k_valid.astype(jnp.int32)
    if not use_pallas:
        return _lane_reference(q, k, v, q_seg, k_seg, k_valid, window, slopes)

    n, _, t_len, _ = q.shape
    slopes_t = None if slopes is None else tuple(float(s) for s in np.asarray(slopes))
    q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, _, _, _ = _to_lane_layout(
        q, k, v, q_seg, k_seg, k_valid, window, lane_block
    )
    with jax.named_scope("lane_attn"):
        out_em = _lane_em_op(q_em, k_em, v_em, q_seg_em, k_seg_em, k_valid_em, window, slopes_t, lane_block)
    return jnp.transpose(out_em, (3, 0, 2, 1))[:n, :, :t_len]  # [N, H, T, D]
