"""Residual gating mechanisms (counterpart of cusrl/nn/layer/gate.py:18-160),
including the GRU-style gate from the GTrXL paper ("Stabilizing Transformers
for Reinforcement Learning")."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field
from cusrl_tpu.nn.layer.linear import Linear

__all__ = [
    "GruGate",
    "HighwayGate",
    "InputGate",
    "OutputGate",
    "PassthroughGate",
    "ResidualGate",
    "SigmoidTanhGate",
    "make_gate",
]


class PassthroughGate(Module):
    dim: int = static_field(default=0)

    def __call__(self, x, y):
        """(residual input x, transformed y) -> output."""
        return y


class ResidualGate(Module):
    dim: int = static_field(default=0)

    def __call__(self, x, y):
        return x + y


class InputGate(Module):
    gate: Linear

    def __call__(self, x, y):
        return jax.nn.sigmoid(self.gate(x)) * x + y


class OutputGate(Module):
    gate: Linear

    def __call__(self, x, y):
        return x + jax.nn.sigmoid(self.gate(x)) * y


class HighwayGate(Module):
    gate: Linear

    def __call__(self, x, y):
        g = jax.nn.sigmoid(self.gate(x))
        return g * x + (1.0 - g) * y


class SigmoidTanhGate(Module):
    gate: Linear

    def __call__(self, x, y):
        return x + jax.nn.sigmoid(self.gate(y)) * jnp.tanh(y)


class GruGate(Module):
    """GRU-style gated residual (GTrXL)."""

    w_r: Linear
    u_r: Linear
    w_z: Linear
    u_z: Linear
    w_g: Linear
    u_g: Linear
    bias: jax.Array

    def __call__(self, x, y):
        r = jax.nn.sigmoid(self.w_r(y) + self.u_r(x))
        z = jax.nn.sigmoid(self.w_z(y) + self.u_z(x) - self.bias)
        h = jnp.tanh(self.w_g(y) + self.u_g(r * x))
        return (1.0 - z) * x + z * h


def make_gate(kind: str | None, dim: int, key: jax.Array, gru_bias: float = 2.0) -> Module:
    kind = (kind or "residual").lower()
    if kind in ("passthrough", "none"):
        return PassthroughGate(dim=dim)
    if kind == "residual":
        return ResidualGate(dim=dim)
    if kind in ("input", "output", "highway", "sigmoid_tanh"):
        gate = Linear.init(key, dim, dim)
        cls = {"input": InputGate, "output": OutputGate, "highway": HighwayGate, "sigmoid_tanh": SigmoidTanhGate}[kind]
        return cls(gate=gate)
    if kind == "gru":
        keys = jax.random.split(key, 6)
        return GruGate(
            w_r=Linear.init(keys[0], dim, dim, bias=False),
            u_r=Linear.init(keys[1], dim, dim, bias=False),
            w_z=Linear.init(keys[2], dim, dim, bias=False),
            u_z=Linear.init(keys[3], dim, dim, bias=False),
            w_g=Linear.init(keys[4], dim, dim, bias=False),
            u_g=Linear.init(keys[5], dim, dim, bias=False),
            bias=jnp.full((dim,), gru_bias, jnp.float32),
        )
    raise ValueError(f"Unknown gate kind '{kind}'")
