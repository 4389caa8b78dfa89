"""Positional encodings (counterpart of cusrl/nn/layer/encoding.py:11-198):
sinusoidal/learnable encodings, rotary embeddings (RoPE), and ALiBi slopes."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field

__all__ = [
    "LearnablePositionalEncoding",
    "RotaryEmbedding",
    "Sinusoidal2dPositionalEncoding",
    "SinusoidalPositionalEncoding",
    "alibi_slopes",
]


class SinusoidalPositionalEncoding(Module):
    dim: int = static_field(default=0)
    max_wavelength: float = static_field(default=10000.0)

    def __call__(self, positions: jax.Array) -> jax.Array:
        """positions [...] -> encodings [..., dim]."""
        half = self.dim // 2
        freqs = jnp.exp(-math.log(self.max_wavelength) * jnp.arange(half) / half)
        angles = positions[..., None].astype(jnp.float32) * freqs
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class LearnablePositionalEncoding(Module):
    table: jax.Array  # [max_len, dim]

    @staticmethod
    def init(key, max_len: int, dim: int) -> "LearnablePositionalEncoding":
        return LearnablePositionalEncoding(table=jax.random.normal(key, (max_len, dim)) * 0.02)

    def __call__(self, positions: jax.Array) -> jax.Array:
        return self.table[positions]


class RotaryEmbedding(Module):
    """RoPE applied to the trailing head dimension."""

    dim: int = static_field(default=0)
    max_wavelength: float = static_field(default=10000.0)

    def _angles(self, positions):
        half = self.dim // 2
        freqs = jnp.exp(-math.log(self.max_wavelength) * jnp.arange(half) / half)
        return positions[..., None].astype(jnp.float32) * freqs  # [..., half]

    def __call__(self, x: jax.Array, positions: jax.Array) -> jax.Array:
        """x [..., L, dim], positions [..., L] -> rotated x."""
        angles = self._angles(positions)  # [..., L, half]
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        return rotated.astype(x.dtype)


def alibi_slopes(num_heads: int) -> jax.Array:
    """ALiBi per-head slopes (geometric sequence)."""

    def slopes_power_of_2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        values = slopes_power_of_2(num_heads)
    else:
        closest = 2 ** math.floor(math.log2(num_heads))
        values = slopes_power_of_2(closest)
        extra = slopes_power_of_2(2 * closest)[0::2][: num_heads - closest]
        values = values + extra
    return jnp.asarray(values, jnp.float32)


class Sinusoidal2dPositionalEncoding(Module):
    """2-D sinusoidal encoding for grid inputs (cusrl/nn/layer/encoding.py 2D
    variants): half the channels encode rows, half encode columns."""

    dim: int = static_field(default=0)
    max_wavelength: float = static_field(default=10000.0)

    def __call__(self, rows: jax.Array, cols: jax.Array) -> jax.Array:
        half = SinusoidalPositionalEncoding(dim=self.dim // 2, max_wavelength=self.max_wavelength)
        return jnp.concatenate([half(rows), half(cols)], axis=-1)
