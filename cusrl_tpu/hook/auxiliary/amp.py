"""Adversarial Motion Priors (counterpart of cusrl/hook/auxiliary/amp.py:16-168).

The discriminator trains with BCE + gradient penalty (nested jax.grad — XLA
happily differentiates through it); the style reward ``-log(1 - sigmoid(D))`` is
added to the env reward during post_step, inside the fused rollout scan.

TPU-native adaptations:
* The hook carries its own PRNG key (a frozen field) for expert sampling and
  minibatch subsampling — randomness stays on device and fully traced.
* A host-callable ``demonstration_sampler`` cannot run inside jit, so when the
  dataset comes from the environment spec it is prefetched ONCE at init into a
  device-resident array (``demonstration_prefetch`` samples) and sampled from
  there.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from cusrl_tpu.nn.base import ModuleFactory, frozen_field, mutable_field, static_field
from cusrl_tpu.nn.layer.rms import RunningMeanStd
from cusrl_tpu.template.hook import Hook
from cusrl_tpu.utils.dict_utils import get_first

__all__ = ["AdversarialMotionPrior"]


def _bce_with_logits(logits, targets):
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class AdversarialMotionPrior(Hook):
    discriminator_factory: ModuleFactory = static_field(default=None)
    dataset_source: Any = static_field(default=None)
    state_indices: tuple[int, ...] | None = static_field(default=None)
    demonstration_prefetch: int = static_field(default=65536)

    batch_size: int | None = static_field(default=512)
    reward_scale: float = mutable_field(default=1.0)
    loss_weight: float = mutable_field(default=1.0)
    grad_penalty_weight: float = mutable_field(default=5.0)

    discriminator: Any = None  # trainable
    transition_rms: RunningMeanStd | None = frozen_field(default=None)
    dataset: jax.Array | None = frozen_field(default=None)
    rng: jax.Array | None = frozen_field(default=None)

    def init(self, agent, key):
        source = self.dataset_source
        dataset = None
        if isinstance(source, str):
            if not source.endswith(".npy"):
                raise ValueError(f"Unsupported dataset file format for '{source}'")
            dataset = jnp.asarray(np.load(source), jnp.float32)
        elif isinstance(source, (np.ndarray, jax.Array)):
            dataset = jnp.asarray(source, jnp.float32)
        elif callable(source):
            dataset = jnp.asarray(source(), jnp.float32)
        elif source is not None:
            raise ValueError(f"Unsupported 'dataset_source' type: {type(source)}")
        if dataset is None:
            sampler = agent.environment_spec.demonstration_sampler
            if sampler is None:
                raise ValueError("Provide 'dataset_source' or environment_spec.demonstration_sampler")
            dataset = jnp.asarray(sampler(self.demonstration_prefetch), jnp.float32)

        transition_dim = dataset.shape[-1]
        disc_key, rng = jax.random.split(key)
        discriminator = self.discriminator_factory(transition_dim, 1, disc_key)
        return self.replace(
            discriminator=discriminator,
            transition_rms=RunningMeanStd.init(transition_dim),
            dataset=dataset,
            rng=rng,
        )

    # -- traced ---------------------------------------------------------------

    def _sample_expert(self, key, num: int):
        indices = jax.random.randint(key, (num,), 0, self.dataset.shape[0])
        return self.dataset[indices]

    def post_step(self, state, transition):
        agent_transition = transition.pop("amp_obs", None)
        if agent_transition is None:
            if self.state_indices is None:
                raise ValueError("AMP observations not provided and 'state_indices' is not set")
            idx = jnp.asarray(self.state_indices)
            obs = get_first(transition, "state", "observation")[..., idx]
            next_obs = get_first(transition, "next_state", "next_observation")[..., idx]
            agent_transition = jnp.concatenate([obs, next_obs], axis=-1)

        key, rng = jax.random.split(self.rng)
        expert_transition = self._sample_expert(key, agent_transition.shape[0])
        rms = self.transition_rms.update(agent_transition).update(expert_transition)
        agent_transition = rms.normalize(agent_transition)
        expert_transition = rms.normalize(expert_transition)
        transition["agent_transition"] = agent_transition
        transition["expert_transition"] = expert_transition

        logit, _, _ = self.discriminator(agent_transition)
        style_reward = self.reward_scale * -jnp.log(jnp.clip(1.0 - jax.nn.sigmoid(logit), min=1e-4))
        transition["reward"] = transition["reward"] + jax.lax.stop_gradient(style_reward)
        return self.replace(rng=rng, transition_rms=rms), transition

    def objective(self, state, metadata, batch):
        agent_transition = batch["agent_transition"].reshape(-1, batch["agent_transition"].shape[-1])
        expert_transition = batch["expert_transition"].reshape(-1, batch["expert_transition"].shape[-1])
        new_self = self
        if self.batch_size is not None:
            key, rng = jax.random.split(self.rng)
            indices = jax.random.randint(key, (self.batch_size,), 0, agent_transition.shape[0])
            agent_transition = agent_transition[indices]
            expert_transition = expert_transition[indices]
            new_self = self.replace(rng=rng)

        disc = lambda x: self.discriminator(x)[0]
        agent_logit = disc(agent_transition)
        expert_logit = disc(expert_transition)
        discrimination_loss = 0.5 * (
            _bce_with_logits(agent_logit, jnp.zeros_like(agent_logit))
            + _bce_with_logits(expert_logit, jnp.ones_like(expert_logit))
        )
        # Gradient penalty: E[||d D(x)/d x||^2] at expert samples (second-order).
        grads = jax.grad(lambda x: disc(x).sum())(expert_transition)
        grad_penalty = jnp.mean(jnp.sum(jnp.square(grads), axis=-1))

        objectives = {
            "amp_discrimination_loss": discrimination_loss * self.loss_weight,
            "amp_grad_penalty_loss": grad_penalty * (self.grad_penalty_weight * self.loss_weight),
        }
        metrics = {"amp_accuracy": jax.lax.stop_gradient(0.5 * ((agent_logit < 0).astype(jnp.float32).mean() + (expert_logit > 0).astype(jnp.float32).mean()))}
        return new_self, batch, objectives, metrics
