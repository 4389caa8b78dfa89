"""Weight initialization hook (counterpart of
cusrl/hook/control/initialization.py:12-125).

Applies orthogonal initialization to every Linear (and, via the generic module
walk, recurrent cell matrices declared as Linear layers), with a smaller gain on
the actor's distribution mean head.  Runs host-side at hook-init time, rewriting
the freshly built actor/critic pytrees in place on the agent.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field
from cusrl_tpu.nn.layer.linear import Linear
from cusrl_tpu.template.hook import Hook

__all__ = ["ModuleInitialization", "map_linear_layers", "orthogonal"]


def orthogonal(key: jax.Array, shape: tuple[int, int], gain: float = 1.0) -> jax.Array:
    return jax.nn.initializers.orthogonal(scale=gain)(key, shape, jnp.float32)


def map_linear_layers(module: Any, fn, _path: str = "") -> Any:
    """Rebuilds a module pytree with ``fn(path, linear) -> linear`` applied to
    every Linear layer (recursing through Modules, tuples, dicts)."""
    if isinstance(module, Linear):
        return fn(_path, module)
    if isinstance(module, Module):
        updates = {}
        for f in dataclasses.fields(module):
            if f.metadata.get("static"):
                continue
            value = getattr(module, f.name)
            new_value = map_linear_layers(value, fn, f"{_path}.{f.name}" if _path else f.name)
            if new_value is not value:
                updates[f.name] = new_value
        return module.replace(**updates) if updates else module
    if isinstance(module, tuple):
        return tuple(map_linear_layers(v, fn, f"{_path}.{i}") for i, v in enumerate(module))
    if isinstance(module, list):
        return [map_linear_layers(v, fn, f"{_path}.{i}") for i, v in enumerate(module)]
    if isinstance(module, dict):
        return {k: map_linear_layers(v, fn, f"{_path}.{k}") for k, v in module.items()}
    return module


class ModuleInitialization(Hook):
    scale: float = static_field(default=math.sqrt(2))
    scale_dist: float = static_field(default=math.sqrt(2) * 0.1)
    zero_bias: bool = static_field(default=True)
    init_actor: bool = static_field(default=True)
    init_critic: bool = static_field(default=True)

    def _reinit(self, module, key, gain_overrides: dict[str, float]):
        keys = iter(jax.random.split(key, 4096))

        def fn(path: str, linear: Linear) -> Linear:
            gain = self.scale
            for prefix, g in gain_overrides.items():
                if path == prefix or path.startswith(prefix + "."):
                    gain = g
            weight = orthogonal(next(keys), linear.weight.shape, gain)
            bias = linear.bias
            if self.zero_bias and bias is not None:
                bias = jnp.zeros_like(bias)
            return linear.replace(weight=weight, bias=bias)

        return map_linear_layers(module, fn)

    def init(self, agent, key):
        actor_key, critic_key = jax.random.split(key)
        if self.init_actor:
            agent.replace_modules(
                actor=self._reinit(agent.actor, actor_key, {"distribution.mean_head": self.scale_dist})
            )
        if self.init_critic:
            agent.replace_modules(critic=self._reinit(agent.critic, critic_key, {}))
        return self
