"""Streaming-statistics helpers (counterpart of cusrl/nn/utils/normalization.py:16-93).

The reference's ``synchronize_mean_var_count`` (an explicit all-gather merge of
per-rank statistics) has no TPU equivalent here by design: statistics updates run
*inside* the jitted step over the globally-sharded batch, so ``jnp.mean`` over the
``data``-sharded axis already yields global statistics — XLA inserts the collective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mean_var_count", "merge_mean_var"]


def mean_var_count(x: jax.Array, *, uncentered: bool = False, mask: jax.Array | None = None):
    """Per-channel mean/variance/count over all leading dims of ``[..., C]``.

    With ``mask`` (broadcastable to ``x.shape[:-1]``), masked-out rows are ignored
    — the static-shape-friendly way to handle variable-length sequences on TPU.
    Returns float32 ``(mean[C], var[C], count[] scalar)``.
    """
    x = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    if mask is not None:
        m = mask.astype(jnp.float32).reshape(-1, 1)
        count = jnp.sum(m)
        safe = jnp.maximum(count, 1.0)
        mean = jnp.sum(x * m, axis=0) / safe
        var = jnp.sum(jnp.square(x - mean) * m, axis=0) / safe
    else:
        count = jnp.asarray(x.shape[0], jnp.float32)
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)
    if uncentered:
        var = var + jnp.square(mean)
        mean = jnp.zeros_like(mean)
    # Degenerate empty batch: identity statistics.
    empty = count == 0
    mean = jnp.where(empty, jnp.zeros_like(mean), mean)
    var = jnp.where(empty, jnp.ones_like(var), var)
    return mean, var, count


def merge_mean_var(old_mean, old_var, old_count, new_mean, new_var, new_count):
    """Chan's parallel merge of two (mean, var, count) aggregates; jit-safe."""
    total = old_count + new_count
    safe_total = jnp.maximum(total, 1e-8)
    w_new = new_count / safe_total
    w_old = old_count / safe_total
    delta = new_mean - old_mean
    mean = old_mean + delta * w_new
    var = old_var + (new_var - old_var) * w_new + jnp.square(delta) * (w_old * w_new)
    return mean, var, total
