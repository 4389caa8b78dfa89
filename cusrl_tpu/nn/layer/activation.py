"""Gated-linear-unit activations and misc layers (counterpart of
cusrl/nn/layer/activation.py:6-26 + detach_grad.py + parameter.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module

__all__ = ["DetachGradient", "GeGlu", "ParameterWrapper", "SwiGlu", "geglu", "swiglu"]


def geglu(x: jax.Array) -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.gelu(b)


def swiglu(x: jax.Array) -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.silu(b)


class GeGlu(Module):
    def __call__(self, x):
        return geglu(x)


class SwiGlu(Module):
    def __call__(self, x):
        return swiglu(x)


class DetachGradient(Module):
    """stop_gradient as a composable layer (cusrl/nn/layer/detach_grad.py:6-10)."""

    def __call__(self, x):
        return jax.lax.stop_gradient(x)


class ParameterWrapper(Module):
    """Exposes a bare parameter array as a module (cusrl/nn/layer/parameter.py:9-27)."""

    value: jax.Array

    def __call__(self, *_args):
        return self.value
