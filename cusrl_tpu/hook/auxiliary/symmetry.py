"""Symmetry suite (counterpart of cusrl/hook/auxiliary/symmetry.py:30-508).

* :class:`MirrorDef` — reindex + sign-flip mirror transform.
* :class:`TransitionMirroring` — rollout-time transition mirroring.
* :class:`MirrorSymmetryLoss` — MSE between policy(obs) and
  mirror(policy(mirror(obs))), with mirrored recurrent memory threaded through
  transitions.
* :class:`SymmetricDataAugmentation` — batch doubling with mirrored transitions
  stacked along an augmentation axis (arbitrary leading dims flow through all
  backbones unchanged, so no special plumbing is needed).
* :class:`SymmetricArchitecture` / :class:`SymmetricActor` — strictly symmetric
  policy averaging original and mirrored passes.

Mirror functions map ``[..., C] -> [..., C]`` (one variant) or
``[..., C] -> [K, ..., C]`` (K variants).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, frozen_field, mutable_field, reset_memory, static_field, storable_memory
from cusrl_tpu.nn.module.actor import Actor
from cusrl_tpu.nn.module.distribution import AdaptiveNormalDist, NormalDist
from cusrl_tpu.template.hook import Hook

__all__ = [
    "MirrorDef",
    "MirrorSymmetryLoss",
    "SymmetricActor",
    "SymmetricArchitecture",
    "SymmetricDataAugmentation",
    "TransitionMirroring",
]

MirrorFn = Callable


class MirrorDef:
    """Gather by ``destination_indices`` then negate ``flipped_indices``."""

    def __init__(self, destination_indices, flipped_indices):
        self.destination_indices = tuple(int(i) for i in destination_indices)
        self.flipped_indices = tuple(int(i) for i in flipped_indices)

    def __call__(self, x):
        import numpy as np

        destination = jnp.asarray(self.destination_indices)
        multiplier = np.ones(len(self.destination_indices), np.float32)
        multiplier[list(self.flipped_indices)] = -1.0
        return x[..., destination] * jnp.asarray(multiplier, x.dtype)

    def __hash__(self):
        return hash((self.destination_indices, self.flipped_indices))

    def __eq__(self, other):
        return (
            isinstance(other, MirrorDef)
            and self.destination_indices == other.destination_indices
            and self.flipped_indices == other.flipped_indices
        )

    def __repr__(self):
        return f"MirrorDef(destination_indices={self.destination_indices}, flipped_indices={self.flipped_indices})"


def _mirror_variants(x, mirror) -> jax.Array:
    """Returns mirrored variants with shape ``[K, ...original...]``."""
    mirrored = mirror(x)
    if mirrored.shape == x.shape:
        return mirrored[None]
    if mirrored.shape[1:] == x.shape:
        return mirrored
    raise ValueError(f"Mirror returned incompatible shape {mirrored.shape} for input {x.shape}")


class _SymmetryHook(Hook):
    mirror_observation: Any = static_field(default=None, kw_only=True)
    mirror_state: Any = static_field(default=None, kw_only=True)
    mirror_action: Any = static_field(default=None, kw_only=True)

    def init(self, agent, key):
        spec = agent.environment_spec
        if spec.mirror_observation is None:
            raise ValueError("'mirror_observation' must be defined for symmetry hooks")
        if spec.has_state and spec.mirror_state is None:
            raise ValueError("'mirror_state' must be defined for symmetry hooks")
        if spec.mirror_action is None:
            raise ValueError("'mirror_action' must be defined for symmetry hooks")
        return self.replace(
            mirror_observation=spec.mirror_observation,
            mirror_state=spec.mirror_state,
            mirror_action=spec.mirror_action,
        )


class TransitionMirroring(_SymmetryHook):
    """Actor sees mirrored inputs; stored transitions are the mirrored variant.
    The selected transform must be self-inverse (actions map back with it)."""

    index: int = static_field(default=0)

    def pre_act(self, state, transition):
        transition["observation"] = _mirror_variants(transition["observation"], self.mirror_observation)[self.index]
        if transition.get("state") is not None:
            transition["state"] = _mirror_variants(transition["state"], self.mirror_state)[self.index]
        return self, transition

    def post_act(self, state, transition):
        transition["action"] = _mirror_variants(transition["action"], self.mirror_action)[self.index]
        return self, transition

    def post_step(self, state, transition):
        transition["next_observation"] = _mirror_variants(
            transition["next_observation"], self.mirror_observation
        )[self.index]
        if transition.get("next_state") is not None:
            transition["next_state"] = _mirror_variants(transition["next_state"], self.mirror_state)[self.index]
        return self, transition


class MirrorSymmetryLoss(_SymmetryHook):
    """policy(obs) must equal mirror(policy(mirror(obs))) in the mean (and
    optionally std)."""

    weight: float | None = mutable_field(default=1.0)
    symmetrize_action_std: bool = static_field(default=False)
    mirrored_memory: Memory = frozen_field(default=None)
    training_only: bool = static_field(default=False, kw_only=True)

    def init(self, agent, key):
        hook = super().init(agent, key)
        if agent.actor.is_recurrent:
            hook = hook.replace(mirrored_memory=agent.actor.init_memory(agent.parallelism))
        return hook

    def rollout_memory_entries(self):
        return {} if self.mirrored_memory is None else {"mirrored_actor_memory": self.mirrored_memory}

    def post_step(self, state, transition):
        if self.mirrored_memory is None:
            return self, transition
        mirrored_observation = _mirror_variants(transition["observation"], self.mirror_observation)[0]
        transition["mirrored_actor_memory"] = storable_memory(self.mirrored_memory, mirrored_observation.shape[0])
        _, new_memory, _ = state.actor.backbone(mirrored_observation, self.mirrored_memory)
        new_memory = reset_memory(new_memory, transition["done"])
        return self.replace(mirrored_memory=new_memory), transition

    def objective(self, state, metadata, batch):
        if self.weight is None:
            return self, batch, None, {}
        actor = state.actor
        memory = batch.get("mirrored_actor_memory")
        temporal = metadata.get("temporal", False)
        if temporal and memory is not None:
            memory = jax.tree.map(lambda m: m[0], memory)
        mirrored_observation = _mirror_variants(batch["observation"], self.mirror_observation)[0]
        mirrored_dist, _, _ = actor(mirrored_observation, memory, sequential=temporal, done=batch.get("done"))

        curr = batch["curr_action_dist"]
        losses = {}
        mean_target = _mirror_variants(mirrored_dist["mean"], self.mirror_action)[0]
        losses["action_mean_symmetry_loss"] = jnp.mean(jnp.square(curr["mean"] - mean_target)) * self.weight
        if self.symmetrize_action_std:
            std_target = jnp.abs(_mirror_variants(mirrored_dist["std"], self.mirror_action)[0])
            losses["action_std_symmetry_loss"] = jnp.mean(jnp.square(curr["std"] - std_target)) * self.weight
        return self, batch, losses, {}


class SymmetricDataAugmentation(_SymmetryHook):
    """Appends mirrored transitions along a new augmentation axis, doubling (or
    K+1-ing) the effective batch; recurrent memories for the mirrored streams
    are stepped alongside rollout."""

    augments_value: bool = static_field(default=True)
    mirrored_actor_memory: Memory = frozen_field(default=None)
    mirrored_critic_memory: Memory = frozen_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        hook = super().init(agent, key)
        if agent.actor.is_recurrent:
            hook = hook.replace(mirrored_actor_memory=agent.actor.init_memory(agent.parallelism))
        if self.augments_value and agent.critic.is_recurrent:
            hook = hook.replace(mirrored_critic_memory=agent.critic.init_memory(agent.parallelism))
        return hook

    @staticmethod
    def _augment(x, mirror):
        variants = _mirror_variants(x, mirror)  # [K, N, C]
        stacked = jnp.concatenate([x[None], variants], axis=0)  # [K+1, N, C]
        return variants, jnp.moveaxis(stacked, 0, 1)  # [N, K+1, C]

    def post_step(self, state, transition):
        new = self
        mirrored_obs, transition["augmented_observation"] = self._augment(
            transition["observation"], self.mirror_observation
        )
        _, transition["augmented_next_observation"] = self._augment(
            transition["next_observation"], self.mirror_observation
        )
        if transition.get("state") is not None:
            mirrored_state, transition["augmented_state"] = self._augment(transition["state"], self.mirror_state)
            _, transition["augmented_next_state"] = self._augment(transition["next_state"], self.mirror_state)
        else:
            mirrored_state = mirrored_obs
        _, transition["augmented_action"] = self._augment(transition["action"], self.mirror_action)

        done = transition["done"]
        # Rank-0 memory leaves (e.g. the attention ring cursor) are GLOBAL —
        # identical across mirrored streams — so the K-stream plumbing keeps
        # them unexpanded instead of indexing a per-stream axis.
        def _augment_memory(orig, mirr):
            if mirr.ndim == 0:
                return jnp.broadcast_to(orig[:, None], (orig.shape[0], mirrored_obs.shape[0] + 1))
            return jnp.concatenate([orig[:, None], mirr], axis=1)

        def _stream(x, kk):
            return x if x.ndim == 0 else x[:, kk]

        def _restack(*ms):
            return ms[0] if ms[0].ndim == 0 else jnp.stack(ms, axis=1)

        if self.mirrored_actor_memory is not None:
            # [N, 1+K, ...] memory: original + mirrored stream states.
            transition["augmented_actor_memory"] = jax.tree.map(
                _augment_memory, transition["actor_memory"], self.mirrored_actor_memory
            )
            new_memories = []
            for k in range(mirrored_obs.shape[0]):
                _, m, _ = state.actor.backbone(
                    mirrored_obs[k], jax.tree.map(lambda x, kk=k: _stream(x, kk), self.mirrored_actor_memory)
                )
                new_memories.append(reset_memory(m, done))
            new = new.replace(mirrored_actor_memory=jax.tree.map(_restack, *new_memories))
        if self.augments_value and self.mirrored_critic_memory is not None:
            transition["augmented_critic_memory"] = jax.tree.map(
                _augment_memory, transition["critic_memory"], self.mirrored_critic_memory
            )
            new_memories = []
            for k in range(mirrored_state.shape[0]):
                _, m, _ = state.critic.backbone(
                    mirrored_state[k], jax.tree.map(lambda x, kk=k: _stream(x, kk), self.mirrored_critic_memory)
                )
                new_memories.append(reset_memory(m, done))
            new = new.replace(mirrored_critic_memory=jax.tree.map(_restack, *new_memories))
        return new, transition

    def objective(self, state, metadata, batch):
        batch["observation"] = batch["augmented_observation"]
        batch["next_observation"] = batch["augmented_next_observation"]
        batch["action"] = batch["augmented_action"]
        if "augmented_state" in batch:
            batch["state"] = batch["augmented_state"]
            batch["next_state"] = batch["augmented_next_state"]

        axis = 2 if metadata.get("temporal") else 1
        factor = batch["augmented_observation"].shape[axis]

        def repeat(x):
            return jnp.repeat(jnp.expand_dims(x, axis), factor, axis=axis)

        for key in ("action_logp", "advantage"):
            if batch.get(key) is not None:
                batch[key] = repeat(batch[key])
        if batch.get("augmented_actor_memory") is not None:
            batch["actor_memory"] = batch["augmented_actor_memory"]
        if self.augments_value:
            for key in ("value", "return"):
                batch[key] = repeat(batch[key])
            if batch.get("augmented_critic_memory") is not None:
                batch["critic_memory"] = batch["augmented_critic_memory"]
        return self, batch, None, {}


class SymmetricArchitecture(_SymmetryHook):
    """Wraps the agent's actor into a strictly symmetric SymmetricActor."""

    def init(self, agent, key):
        hook = super().init(agent, key)
        actor = agent.actor
        if isinstance(actor, SymmetricActor):
            return hook
        if not isinstance(actor.distribution, (NormalDist, AdaptiveNormalDist)):
            raise ValueError("SymmetricActor requires a Normal distribution")
        agent.replace_modules(
            actor=SymmetricActor(
                backbone=actor.backbone,
                distribution=actor.distribution,
                mirror_observation=hook.mirror_observation,
                mirror_action=hook.mirror_action,
            )
        )
        return hook


class SymmetricActor(Actor):
    """Averages original and mirrored policy passes: strictly symmetric.

    Memory is ``{"original": ..., "mirrored": ...}`` when recurrent.
    """

    mirror_observation: Any = static_field(default=None)
    mirror_action: Any = static_field(default=None)

    def init_memory(self, batch_size, dtype=None):
        if not self.backbone.is_recurrent:
            return None
        return {
            "original": self.backbone.init_memory(batch_size),
            "mirrored": self.backbone.init_memory(batch_size),
        }

    def _split_memory(self, memory):
        if memory is None:
            return None, None
        return memory["original"], memory["mirrored"]

    def __call__(self, observation, memory=None, *, sequential=False, **kwargs):
        original_memory, mirrored_memory = self._split_memory(memory)
        mirrored_observation = _mirror_variants(observation, self.mirror_observation)[0]

        orig_latent, original_memory, orig_aux = self.backbone(
            observation, original_memory, sequential=sequential, **kwargs
        )
        mirr_latent, mirrored_memory, mirr_aux = self.backbone(
            mirrored_observation, mirrored_memory, sequential=sequential, **kwargs
        )
        orig_dist = self.distribution(orig_latent)
        mirr_dist = self.distribution(mirr_latent)
        dist_params = {
            "mean": (orig_dist["mean"] + _mirror_variants(mirr_dist["mean"], self.mirror_action)[0]) / 2,
            "std": (orig_dist["std"] + jnp.abs(_mirror_variants(mirr_dist["std"], self.mirror_action)[0])) / 2,
        }
        aux = {f"original.backbone.{k}": v for k, v in orig_aux.items()}
        aux["original.backbone.output"] = orig_latent
        aux["original.action_dist"] = orig_dist
        aux.update({f"mirrored.backbone.{k}": v for k, v in mirr_aux.items()})
        aux["mirrored.backbone.output"] = mirr_latent
        aux["mirrored.action_dist"] = mirr_dist
        aux["backbone.output"] = orig_latent
        new_memory = None
        if original_memory is not None:
            new_memory = {"original": original_memory, "mirrored": mirrored_memory}
        return dist_params, new_memory, aux

    def act_deterministic(self, observation, memory=None, *, sequential=False, **kwargs):
        original_memory, mirrored_memory = self._split_memory(memory)
        mirrored_observation = _mirror_variants(observation, self.mirror_observation)[0]
        orig_latent, original_memory, _ = self.backbone(observation, original_memory, sequential=sequential, **kwargs)
        mirr_latent, mirrored_memory, _ = self.backbone(
            mirrored_observation, mirrored_memory, sequential=sequential, **kwargs
        )
        original_action = self.distribution.determine(orig_latent)
        mirrored_action = _mirror_variants(self.distribution.determine(mirr_latent), self.mirror_action)[0]
        action = (original_action + mirrored_action) / 2
        new_memory = None
        if original_memory is not None:
            new_memory = {"original": original_memory, "mirrored": mirrored_memory}
        return action, new_memory
