"""SimBa residual backbone (counterpart of cusrl/nn/module/simba.py:42-73).

"SimBa: Simplicity Bias for Scaling Up Parameters in Deep RL": input projection
followed by residual blocks of LayerNorm -> Linear(4x) -> activation -> Linear,
with a final LayerNorm.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field
from cusrl_tpu.nn.layer.linear import Linear, get_activation

__all__ = ["Simba", "SimbaFactory"]


class LayerNorm(Module):
    scale: jax.Array
    bias: jax.Array
    epsilon: float = static_field(default=1e-6)

    @staticmethod
    def init(dim: int) -> "LayerNorm":
        return LayerNorm(scale=jnp.ones(dim, jnp.float32), bias=jnp.zeros(dim, jnp.float32))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * self.scale + self.bias
        return y.astype(x.dtype)


class SimbaBlock(Module):
    norm: LayerNorm
    up: Linear
    down: Linear
    activation: str = static_field(default="relu")

    def __call__(self, x):
        act = get_activation(self.activation)
        return x + self.down(act(self.up(self.norm(x))))


class Simba(Module):
    input_proj: Linear
    blocks: tuple[SimbaBlock, ...]
    final_norm: LayerNorm
    input_dim: int = static_field(default=0)
    output_dim: int = static_field(default=0)

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        h = self.input_proj(x)
        for block in self.blocks:
            h = block(h)
        return self.final_norm(h), memory, {}


@dataclasses.dataclass
class SimbaFactory(ModuleFactory):
    hidden_dim: int = 256
    num_blocks: int = 2
    activation: str = "relu"
    compute_dtype: str | None = "default"

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> Simba:
        from cusrl_tpu.utils.config import CONFIG

        dtype = CONFIG.compute_dtype if self.compute_dtype == "default" else self.compute_dtype
        h = self.hidden_dim
        keys = jax.random.split(key, 1 + 2 * self.num_blocks)
        blocks = []
        for i in range(self.num_blocks):
            blocks.append(
                SimbaBlock(
                    norm=LayerNorm.init(h),
                    up=Linear.init(keys[1 + 2 * i], h, 4 * h, compute_dtype=dtype),
                    down=Linear.init(keys[2 + 2 * i], 4 * h, h, compute_dtype=dtype),
                    activation=self.activation,
                )
            )
        return Simba(
            input_proj=Linear.init(keys[0], input_dim, h, compute_dtype=dtype),
            blocks=tuple(blocks),
            final_norm=LayerNorm.init(h),
            input_dim=input_dim,
            output_dim=h,
        )


# Reference-style Factory attributes (cusrl module.Factory contract).
Simba.Factory = SimbaFactory
