"""Policy distillation (counterpart of cusrl/hook/auxiliary/distillation.py:12-97).

``PolicyDistillationLoss`` regresses the current policy mean onto expert actions
already present in the batch; ``PolicyDistillation`` additionally runs a frozen
expert policy during rollout to produce those targets.

TPU adaptation: the reference loads a TorchScript expert; here the expert is a
frozen actor Module pytree — load one with
``cusrl_tpu.export.load_exported_policy`` or pass any (Module, memory-capable)
pair.  Its parameters travel in the hook state but are excluded from training.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, frozen_field, mutable_field, reset_memory, static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["PolicyDistillation", "PolicyDistillationLoss"]


class PolicyDistillationLoss(Hook):
    target_name: str = static_field(default="expert_action")
    weight: float = mutable_field(default=1.0)

    def objective(self, state, metadata, batch):
        action_dist = batch["curr_action_dist"]
        target = batch[self.target_name]
        loss = jnp.mean(jnp.square(action_dist["mean"] - jax.lax.stop_gradient(target)))
        return self, batch, {"distillation_loss": loss * self.weight}, {}


class PolicyDistillation(PolicyDistillationLoss):
    """Queries a frozen expert each step; trains the policy toward its actions."""

    expert_path: str | None = static_field(default=None, kw_only=True)
    observation_name: str = static_field(default="observation", kw_only=True)
    expert: Any = frozen_field(default=None)
    expert_memory: Memory = frozen_field(default=None)

    def init(self, agent, key):
        expert = self.expert
        if expert is None:
            if not self.expert_path:
                raise ValueError("Provide 'expert' module or 'expert_path'")
            from cusrl_tpu.export import load_exported_policy

            expert = load_exported_policy(self.expert_path)
        memory = expert.init_memory(agent.parallelism) if expert.is_recurrent else None
        return self.replace(expert=expert, expert_memory=memory)

    def post_step(self, state, transition):
        observation = transition[self.observation_name]
        action, new_memory = self.expert.act_deterministic(observation, self.expert_memory)
        transition[self.target_name] = action
        new_memory = reset_memory(new_memory, transition["done"])
        return self.replace(expert_memory=new_memory), transition
