"""Random Network Distillation (counterpart of cusrl/hook/auxiliary/rnd.py:15-81).

Intrinsic reward ``scale * ||f_target(s') - f_predictor(s')||^2 / d`` added to the
rollout reward in pre_update; the predictor trains with MSE toward the frozen
Xavier-initialized target.  Both passes are fully batched over [T*N] — MXU work.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, ModuleFactory, frozen_field, mutable_field, static_field
from cusrl_tpu.template.hook import Hook
from cusrl_tpu.utils.dict_utils import get_first

__all__ = ["RandomNetworkDistillation"]


def _xavier_reinit(module: Module, key: jax.Array) -> Module:
    from cusrl_tpu.hook.control.initialization import map_linear_layers

    keys = iter(jax.random.split(key, 1024))

    def fn(path, linear):
        weight = jax.nn.initializers.glorot_normal()(next(keys), linear.weight.shape, jnp.float32)
        bias = None if linear.bias is None else jnp.zeros_like(linear.bias)
        return linear.replace(weight=weight, bias=bias)

    return map_linear_layers(module, fn)


def _slice_channels(x: jax.Array, indices) -> jax.Array:
    if indices is None:
        return x
    return x[..., jnp.asarray(indices)]


class RandomNetworkDistillation(Hook):
    module_factory: ModuleFactory = static_field(default=None)
    output_dim: int = static_field(default=64)
    reward_scale: float = mutable_field(default=1.0)
    state_indices: tuple[int, ...] | None = static_field(default=None)

    target: Module | None = frozen_field(default=None)
    predictor: Any = None  # trainable

    def init(self, agent, key):
        input_dim = agent.state_dim if self.state_indices is None else len(self.state_indices)
        t_key, p_key, ti_key, pi_key = jax.random.split(key, 4)
        target = _xavier_reinit(self.module_factory(input_dim, self.output_dim, t_key), ti_key)
        predictor = _xavier_reinit(self.module_factory(input_dim, self.output_dim, p_key), pi_key)
        return self.replace(target=target, predictor=predictor)

    def _novelty(self, state):
        x = _slice_channels(state, self.state_indices)
        target_out, _, _ = self.target(x)
        predicted, _, _ = self.predictor(x)
        return target_out, predicted

    def pre_update(self, state, rollout):
        next_state = get_first(rollout, "next_state", "next_observation")
        target_out, predicted = self._novelty(jax.lax.stop_gradient(next_state))
        rnd_reward = self.reward_scale * jnp.mean(jnp.square(target_out - predicted), axis=-1, keepdims=True)
        rnd_reward = jax.lax.stop_gradient(rnd_reward)
        rollout = {**rollout, "reward": rollout["reward"] + rnd_reward}
        return self, rollout, {"rnd_reward": rnd_reward.mean()}

    def objective(self, state, metadata, batch):
        next_state = get_first(batch, "next_state", "next_observation")
        target_out, predicted = self._novelty(next_state)
        loss = jnp.mean(jnp.square(predicted - jax.lax.stop_gradient(target_out)))
        return self, batch, {"rnd_loss": loss}, {}
