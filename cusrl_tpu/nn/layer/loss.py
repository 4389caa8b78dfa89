"""Loss utilities (counterpart of cusrl/nn/layer/loss.py:10-169)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["GradientPenaltyLoss", "L2RegularizationLoss", "NormalNllLoss", "gradient_penalty"]


def gradient_penalty(fn, inputs, *, reduce_mean: bool = True):
    """E[||d fn(x)/d x||^2] — the AMP/WGAN gradient penalty via nested jax.grad
    (the reference's autograd.grad second-order path, loss.py:10-60)."""
    grads = jax.grad(lambda x: jnp.sum(fn(x)))(inputs)
    per_sample = jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=-1)
    return per_sample.mean() if reduce_mean else per_sample


class GradientPenaltyLoss:
    def __init__(self, reduce_mean: bool = True):
        self.reduce_mean = reduce_mean

    def __call__(self, fn, inputs):
        return gradient_penalty(fn, inputs, reduce_mean=self.reduce_mean)


class NormalNllLoss:
    """Negative log-likelihood of targets under a diagonal Gaussian prediction."""

    def __init__(self, eps: float = 1e-6, full: bool = False):
        self.eps = eps
        self.full = full

    def __call__(self, mean, var, target):
        var = jnp.maximum(var.astype(jnp.float32), self.eps)
        nll = 0.5 * (jnp.log(var) + jnp.square(target - mean) / var)
        if self.full:
            nll = nll + 0.5 * jnp.log(2.0 * jnp.pi)
        return nll.mean()


class L2RegularizationLoss:
    """Mean squared magnitude of a pytree of parameters (weight decay as a loss)."""

    def __init__(self, weight: float = 1.0):
        self.weight = weight

    def __call__(self, params) -> jax.Array:
        leaves = [leaf for leaf in jax.tree.leaves(params) if hasattr(leaf, "dtype")]
        if not leaves:
            return jnp.zeros((), jnp.float32)
        total = sum(jnp.sum(jnp.square(leaf.astype(jnp.float32))) for leaf in leaves)
        count = sum(leaf.size for leaf in leaves)
        return self.weight * total / count
