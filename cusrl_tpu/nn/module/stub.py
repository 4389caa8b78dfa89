"""Stub/identity backbones (counterpart of cusrl/nn/module/stub.py:17-47).

``StubModule`` outputs zeros — used as the critic backbone in pure distillation
where no value function is learned; ``Identity`` passes inputs through.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field

__all__ = ["Identity", "IdentityFactory", "StubModule", "StubModuleFactory"]


class StubModule(Module):
    input_dim: int = static_field(default=0)
    output_dim: int = static_field(default=1)

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        return jnp.zeros((*x.shape[:-1], self.output_dim), jnp.float32), memory, {}


class Identity(Module):
    input_dim: int = static_field(default=0)

    @property
    def output_dim(self) -> int:
        return self.input_dim

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        return x, memory, {}


@dataclasses.dataclass
class StubModuleFactory(ModuleFactory):
    output_dim: int = 1

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> StubModule:
        return StubModule(input_dim=input_dim, output_dim=output_dim or self.output_dim)


@dataclasses.dataclass
class IdentityFactory(ModuleFactory):
    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> Identity:
        return Identity(input_dim=input_dim)


# Reference-style Factory attributes (cusrl module.Factory contract).
StubModule.Factory = StubModuleFactory
Identity.Factory = IdentityFactory
