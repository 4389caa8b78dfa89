"""Reward shaping hook (counterpart of cusrl/hook/mdp/reward.py:10-47)."""

from __future__ import annotations

import jax.numpy as jnp

from cusrl_tpu.nn.base import mutable_field
from cusrl_tpu.template.hook import Hook

__all__ = ["RewardShaping"]


class RewardShaping(Hook):
    scale: float = mutable_field(default=1.0)
    shift: float = mutable_field(default=0.0)
    lower_bound: float | None = mutable_field(default=None)
    upper_bound: float | None = mutable_field(default=None)

    def post_step(self, state, transition):
        reward = transition["reward"] * self.scale + self.shift
        if self.lower_bound is not None or self.upper_bound is not None:
            reward = jnp.clip(reward, self.lower_bound, self.upper_bound)
        transition["reward"] = reward
        return self, transition
