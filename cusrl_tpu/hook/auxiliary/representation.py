"""Representation-learning probes (counterpart of
cusrl/hook/auxiliary/representation.py:14-182).

Linear heads on the actor's intermediate representation (published by
OnPolicyPreparation under ``batch["actor_intermediate"]``) predicting returns /
state slices / action-conditioned next-state slices.  Each head also registers
itself as an extra export-graph output.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.nn.layer.linear import Linear
from cusrl_tpu.template.hook import Hook

__all__ = ["NextStatePrediction", "ReturnPrediction", "StatePrediction"]


def _slice(x, indices):
    if indices is None:
        return x
    return x[..., jnp.asarray(indices)]


def _latent_dim(agent, latent_name: str) -> int:
    obs = jnp.zeros((1, agent.observation_dim))
    _, _, aux = agent.actor(obs, agent.actor.init_memory(1))
    if latent_name not in aux:
        raise KeyError(f"Actor does not publish intermediate '{latent_name}' (has {sorted(aux)})")
    return aux[latent_name].shape[-1]


class ReturnPrediction(Hook):
    latent_name: str = static_field(default="backbone.output")
    weight: float = mutable_field(default=0.01)
    predicts_value_instead_of_return: bool = static_field(default=False)
    predictor: Any = None  # trainable
    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        return self.replace(predictor=Linear.init(key, _latent_dim(agent, self.latent_name), agent.value_dim))

    def objective(self, state, metadata, batch):
        latent = batch["actor_intermediate"][self.latent_name]
        target = batch["value"] if self.predicts_value_instead_of_return else batch["return"]
        loss = jnp.mean(jnp.square(self.predictor(latent) - jax.lax.stop_gradient(target)))
        return self, batch, {"return_prediction_loss": loss * self.weight}, {}

    def post_export(self, agent, graph) -> None:
        graph.add_head("return_prediction", self.predictor, input_name=f"actor.{self.latent_name}")


class StatePrediction(Hook):
    target_indices: tuple[int, ...] | None = static_field(default=None)
    latent_name: str = static_field(default="backbone.output")
    weight: float = mutable_field(default=0.01)
    predictor: Any = None
    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        if not agent.environment_spec.has_state:
            raise ValueError("StatePrediction requires a state space")
        target_dim = agent.state_dim if self.target_indices is None else len(self.target_indices)
        return self.replace(predictor=Linear.init(key, _latent_dim(agent, self.latent_name), target_dim))

    def objective(self, state, metadata, batch):
        latent = batch["actor_intermediate"][self.latent_name]
        target = _slice(batch["state"], self.target_indices)
        loss = jnp.mean(jnp.square(self.predictor(latent) - jax.lax.stop_gradient(target)))
        return self, batch, {"state_prediction_loss": loss * self.weight}, {}

    def post_export(self, agent, graph) -> None:
        graph.add_head("state_prediction", self.predictor, input_name=f"actor.{self.latent_name}")


class NextStatePrediction(Hook):
    """Action-conditioned forward model probe on the actor latent."""

    target_indices: tuple[int, ...] | None = static_field(default=None)
    latent_name: str = static_field(default="backbone.output")
    weight: float = mutable_field(default=0.01)
    predictor: Any = None
    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        if not agent.environment_spec.has_state:
            raise ValueError("NextStatePrediction requires a state space")
        target_dim = agent.state_dim if self.target_indices is None else len(self.target_indices)
        latent_dim = _latent_dim(agent, self.latent_name)
        return self.replace(predictor=Linear.init(key, latent_dim + agent.action_dim, target_dim))

    def objective(self, state, metadata, batch):
        latent = batch["actor_intermediate"][self.latent_name]
        inputs = jnp.concatenate([latent, batch["action"].astype(latent.dtype)], axis=-1)
        target = _slice(batch["next_state"], self.target_indices)
        loss = jnp.mean(jnp.square(self.predictor(inputs) - jax.lax.stop_gradient(target)))
        return self, batch, {"next_state_prediction_loss": loss * self.weight}, {}

    def post_export(self, agent, graph) -> None:
        graph.add_head(
            "next_state_prediction", self.predictor, input_name=f"actor.{self.latent_name}", extra_inputs=("action",)
        )
