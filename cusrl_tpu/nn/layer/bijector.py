"""Bijective scalar transformations used to parameterize positive quantities
(e.g. policy standard deviations).

Behavioral counterpart of cusrl/nn/layer/bijector.py:19-150: exp / sigmoid /
softplus / identity with clamped inverses and the string spec format
``"exp_0.01_1.0"``.  Implemented as frozen dataclasses (hashable, parameter-free)
so they can live in static pytree metadata and trace cleanly under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax.numpy as jnp

__all__ = [
    "Bijector",
    "ExponentialBijector",
    "IdentityBijector",
    "SigmoidBijector",
    "SoftplusBijector",
    "make_bijector",
]


def _is_array(x: Any) -> bool:
    return hasattr(x, "dtype")


@dataclasses.dataclass(frozen=True)
class Bijector:
    @classmethod
    def from_str(cls, spec: str) -> "Bijector":
        if not spec:
            return cls()
        return cls(*[float(p) for p in spec.split("_")])

    def __call__(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class IdentityBijector(Bijector):
    def __call__(self, x):
        return x

    def inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class ExponentialBijector(Bijector):
    min_value: float = 0.01
    max_value: float = 1.0

    def __call__(self, x):
        lo, hi = math.log(self.min_value), math.log(self.max_value)
        if _is_array(x):
            return jnp.exp(jnp.clip(x, lo, hi))
        return math.exp(min(max(x, lo), hi))

    def inverse(self, y):
        if _is_array(y):
            return jnp.log(jnp.clip(y, self.min_value, self.max_value))
        return math.log(min(max(y, self.min_value), self.max_value))


@dataclasses.dataclass(frozen=True)
class SigmoidBijector(Bijector):
    min_value: float = 0.0
    max_value: float = 1.0
    eps: float = 0.01

    def __call__(self, x):
        span = self.max_value - self.min_value
        if _is_array(x):
            return self.min_value + span * jax_sigmoid(x)
        return self.min_value + span / (1.0 + math.exp(-x))

    def inverse(self, y):
        lo, hi = self.min_value + self.eps, self.max_value - self.eps
        if _is_array(y):
            clamped = jnp.clip(y, lo, hi)
            return jnp.log((clamped - self.min_value) / (self.max_value - clamped))
        clamped = min(max(y, lo), hi)
        return math.log((clamped - self.min_value) / (self.max_value - clamped))


@dataclasses.dataclass(frozen=True)
class SoftplusBijector(Bijector):
    scale: float = 1.0
    min_value: float = 0.01
    max_value: float = 1.0

    def _inverse_unclamped(self, y: float) -> float:
        scaled = y * self.scale
        return (scaled + math.log1p(-math.exp(-scaled))) / self.scale

    def __call__(self, x):
        lo = self._inverse_unclamped(self.min_value)
        hi = self._inverse_unclamped(self.max_value)
        if _is_array(x):
            clamped = jnp.clip(x, lo, hi)
            return jnp.logaddexp(clamped * self.scale, 0.0) / self.scale
        clamped = min(max(x, lo), hi)
        return math.log1p(math.exp(clamped * self.scale)) / self.scale

    def inverse(self, y):
        if _is_array(y):
            clamped = jnp.clip(y, self.min_value, self.max_value)
            scaled = clamped * self.scale
            return (scaled + jnp.log1p(-jnp.exp(-scaled))) / self.scale
        return self._inverse_unclamped(min(max(y, self.min_value), self.max_value))


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def make_bijector(spec: str | Bijector | None) -> Bijector:
    if isinstance(spec, Bijector):
        return spec
    if spec is None:
        return IdentityBijector()
    kind, _, params = spec.partition("_")
    kind = kind.lower()
    table: dict[str, type[Bijector]] = {
        "": IdentityBijector,
        "identity": IdentityBijector,
        "exp": ExponentialBijector,
        "exponential": ExponentialBijector,
        "sigmoid": SigmoidBijector,
        "softplus": SoftplusBijector,
    }
    if kind not in table:
        raise ValueError(f"Unsupported bijector specification '{spec}'")
    return table[kind].from_str(params)
