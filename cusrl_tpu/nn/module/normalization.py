"""Frozen affine normalization modules (counterpart of
cusrl/nn/module/normalization.py:27-89) — export-graph pre/post nodes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, frozen_field

__all__ = ["Denormalization", "Normalization"]


class Normalization(Module):
    """y = (x - shift) / scale with frozen statistics."""

    scale: jax.Array = frozen_field(default=None)
    shift: jax.Array = frozen_field(default=None)

    @staticmethod
    def init(scale, shift) -> "Normalization":
        return Normalization(scale=jnp.asarray(scale, jnp.float32), shift=jnp.asarray(shift, jnp.float32))

    @property
    def input_dim(self) -> int:
        return self.scale.shape[-1]

    output_dim = input_dim

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        return ((x.astype(jnp.float32) - self.shift) / self.scale).astype(x.dtype), memory, {}


class Denormalization(Module):
    """y = x * scale + shift with frozen statistics."""

    scale: jax.Array = frozen_field(default=None)
    shift: jax.Array = frozen_field(default=None)

    @staticmethod
    def init(scale, shift) -> "Denormalization":
        return Denormalization(scale=jnp.asarray(scale, jnp.float32), shift=jnp.asarray(shift, jnp.float32))

    @property
    def input_dim(self) -> int:
        return self.scale.shape[-1]

    output_dim = input_dim

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        return (x.astype(jnp.float32) * self.scale + self.shift).astype(x.dtype), memory, {}
