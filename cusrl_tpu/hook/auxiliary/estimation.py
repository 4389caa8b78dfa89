"""Auxiliary state estimation (counterpart of cusrl/hook/auxiliary/estimation.py:13-131).

A dedicated (possibly recurrent) estimator predicts a slice of one transition
entry from a slice of another (e.g. privileged state from observations); its
memory threads through transitions as ``estimator_memory`` so sequence-mode
training replays the rollout exactly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import (
    Memory,
    ModuleFactory,
    frozen_field,
    mutable_field,
    reset_memory,
    static_field,
    storable_memory,
)
from cusrl_tpu.template.hook import Hook

__all__ = ["StateEstimation"]


def _slice(x, indices):
    if indices is None:
        return x
    return x[..., jnp.asarray(indices)]


def _dim_of(agent, name: str, dim: int | None) -> int:
    if dim is not None:
        return dim
    if name in ("observation", "next_observation"):
        return agent.observation_dim
    if name in ("state", "next_state"):
        return agent.state_dim
    raise ValueError(f"Dimension must be specified for entry '{name}'")


class StateEstimation(Hook):
    estimator_factory: ModuleFactory = static_field(default=None)
    source_name: str = static_field(default="observation")
    source_indices: tuple[int, ...] | None = static_field(default=None)
    source_dim: int | None = static_field(default=None)
    target_name: str = static_field(default="state")
    target_indices: tuple[int, ...] | None = static_field(default=None)
    target_dim: int | None = static_field(default=None)
    estimation_name: str = static_field(default="state_estimation")
    weight: float = mutable_field(default=1.0)

    estimator: Any = None  # trainable
    memory: Memory = frozen_field(default=None)

    def init(self, agent, key):
        source_dim = _dim_of(agent, self.source_name, self.source_dim)
        target_dim = _dim_of(agent, self.target_name, self.target_dim)
        if self.source_indices is not None:
            source_dim = len(self.source_indices)
        if self.target_indices is not None:
            target_dim = len(self.target_indices)
        estimator = self.estimator_factory(source_dim, target_dim, key)
        memory = estimator.init_memory(agent.parallelism) if estimator.is_recurrent else None
        return self.replace(estimator=estimator, memory=memory)

    def pre_act(self, state, transition):
        source = _slice(transition[self.source_name], self.source_indices)
        estimation, next_memory, _ = self.estimator(source, self.memory)
        transition[self.estimation_name] = estimation
        if self.memory is not None:
            transition["estimator_memory"] = storable_memory(self.memory, source.shape[0])
        return self.replace(memory=next_memory), transition

    def rollout_memory_entries(self):
        return {} if self.memory is None else {"estimator_memory": self.memory}

    def post_step(self, state, transition):
        if self.memory is None:
            return self, transition
        return self.replace(memory=reset_memory(self.memory, transition["done"])), transition

    def objective(self, state, metadata, batch):
        source = _slice(batch[self.source_name], self.source_indices)
        target = _slice(batch[self.target_name], self.target_indices)
        memory = batch.get("estimator_memory")
        temporal = metadata.get("temporal", False)
        if temporal and memory is not None:
            memory = jax.tree.map(lambda m: m[0], memory)
        estimation, _, _ = self.estimator(source, memory, sequential=temporal, done=batch.get("done"))
        loss = jnp.mean(jnp.square(estimation - jax.lax.stop_gradient(target)))
        return self, batch, {"state_estimation_loss": loss * self.weight}, {}
