"""PPO clipped surrogate and entropy bonus (counterpart of
cusrl/hook/on_policy/ppo.py:10-85)."""

from __future__ import annotations

import jax.numpy as jnp

from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook, validate_concrete

__all__ = ["EntropyLoss", "PpoSurrogateLoss"]


def ppo_surrogate_loss(advantage, prob_ratio, clip_ratio):
    advantage = advantage.astype(jnp.float32)
    clipped = jnp.clip(prob_ratio, 1.0 - clip_ratio, 1.0 + clip_ratio)
    return -jnp.minimum(advantage * prob_ratio, advantage * clipped).mean()


class PpoSurrogateLoss(Hook):
    clip_ratio: float = mutable_field(default=0.2)
    weight: float = mutable_field(default=1.0)
    training_only: bool = static_field(default=True, kw_only=True)

    def __post_init__(self):
        validate_concrete(lambda c: c > 0, self.clip_ratio, "'clip_ratio' must be positive")
        validate_concrete(lambda w: w >= 0, self.weight, "'weight' must be non-negative")

    def objective(self, state, metadata, batch):
        advantage = batch["advantage"]
        if advantage.shape[-1] != 1:
            raise ValueError(f"Expected advantage with shape [..., 1]; got {advantage.shape}")
        loss = ppo_surrogate_loss(advantage, batch["action_prob_ratio"], self.clip_ratio)
        return self, batch, {"surrogate_loss": loss * self.weight}, {}


class EntropyLoss(Hook):
    weight: float = mutable_field(default=0.01)
    training_only: bool = static_field(default=True, kw_only=True)

    def __post_init__(self):
        validate_concrete(lambda w: w >= 0, self.weight, "'weight' must be non-negative")

    def objective(self, state, metadata, batch):
        loss = -batch["curr_entropy"].mean()
        return self, batch, {"entropy_loss": loss * self.weight}, {}
