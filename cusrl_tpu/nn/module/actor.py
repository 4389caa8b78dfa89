"""Actor module: backbone + distribution head (counterpart of
cusrl/nn/module/actor.py:26-274).

The reference's ``forward_type`` string router exists for TorchScript export; in
JAX each path is simply a separate pure method (export jits whichever is needed).
``aux`` carries intermediate representations (the functional ``intermediate_repr``),
always including ``"backbone.output"`` for representation-learning hooks.
"""

from __future__ import annotations

import dataclasses

import jax

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory
from cusrl_tpu.nn.module.distribution import Distribution, DistributionFactory, NormalDistFactory

__all__ = ["Actor", "ActorFactory"]


class Actor(Module):
    backbone: Module
    distribution: Distribution

    @property
    def input_dim(self) -> int:
        return self.backbone.input_dim

    @property
    def output_dim(self) -> int:
        return self.distribution.output_dim

    @property
    def latent_dim(self) -> int:
        return self.backbone.output_dim

    @property
    def is_recurrent(self) -> bool:
        return self.backbone.is_recurrent

    def init_memory(self, batch_size, dtype=None) -> Memory:
        return self.backbone.init_memory(batch_size) if self.backbone.is_recurrent else None

    def __call__(self, observation: jax.Array, memory: Memory = None, *, sequential: bool = False, **kwargs):
        """Returns ``(dist_params, new_memory, aux)``."""
        latent, new_memory, backbone_aux = self.backbone(observation, memory, sequential=sequential, **kwargs)
        dist_params = self.distribution(latent)
        aux = {f"backbone.{k}": v for k, v in backbone_aux.items()}
        aux["backbone.output"] = latent
        return dist_params, new_memory, aux

    def explore(self, observation, key: jax.Array, memory: Memory = None, *, sequential: bool = False, **kwargs):
        """Samples an action: ``(dist_params, (action, logp), new_memory, aux)``."""
        dist_params, new_memory, aux = self(observation, memory, sequential=sequential, **kwargs)
        action, logp = self.distribution.sample(dist_params, key)
        return dist_params, (action, logp), new_memory, aux

    def act(self, observation, key: jax.Array, memory: Memory = None, *, sequential: bool = False, **kwargs):
        """Sampled action only: ``(action, new_memory)``."""
        _, (action, _), new_memory, _ = self.explore(observation, key, memory, sequential=sequential, **kwargs)
        return action, new_memory

    def act_deterministic(self, observation, memory: Memory = None, *, sequential: bool = False, **kwargs):
        """Mode action: ``(action, new_memory)``."""
        latent, new_memory, _ = self.backbone(observation, memory, sequential=sequential, **kwargs)
        return self.distribution.determine(latent), new_memory

    # -- distribution passthroughs -------------------------------------------

    def compute_logp(self, dist_params, action):
        return self.distribution.compute_logp(dist_params, action)

    def compute_entropy(self, dist_params):
        return self.distribution.compute_entropy(dist_params)

    def compute_kl_div(self, p, q):
        return self.distribution.compute_kl_div(p, q)


@dataclasses.dataclass
class ActorFactory:
    backbone_factory: ModuleFactory
    distribution_factory: DistributionFactory = dataclasses.field(default_factory=NormalDistFactory)

    def __call__(self, input_dim: int, action_dim: int, key: jax.Array) -> Actor:
        backbone_key, dist_key = jax.random.split(key)
        backbone = self.backbone_factory(input_dim, None, backbone_key)
        distribution = self.distribution_factory(backbone.output_dim, action_dim, dist_key)
        return Actor(backbone=backbone, distribution=distribution)


# Reference-style Factory attributes (cusrl module.Factory contract).
Actor.Factory = ActorFactory
