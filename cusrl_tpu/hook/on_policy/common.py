"""On-policy batch preparation (counterpart of cusrl/hook/on_policy/common.py:12-49).

Re-evaluates the current policy on the sampled batch, writing
``curr_action_dist`` / ``curr_action_logp`` / ``curr_entropy`` /
``action_logp_ratio`` / ``action_prob_ratio`` (and optionally ``kl_divergence``).
For temporal batches the actor runs in sequence mode with done-driven memory
resets — identical math to rollout by construction (same lax.scan cell).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["OnPolicyPreparation"]


class OnPolicyPreparation(Hook):
    calculate_kl_divergence: bool = static_field(default=False)
    training_only: bool = static_field(default=True, kw_only=True)

    def objective(self, state, metadata, batch):
        actor = state.actor
        if "curr_action_dist" in batch:
            # Precomputed by JointPolicyValueEvaluation (stacked actor+critic pass).
            action_dist = batch["curr_action_dist"]
            _aux = batch.get("actor_intermediate", {})
        else:
            memory = batch.get("actor_memory")
            temporal = metadata.get("temporal", False)
            if temporal and memory is not None:
                memory = jax.tree.map(lambda m: m[0], memory)
            action_dist, _, _aux = actor(
                batch["observation"], memory, sequential=temporal, done=batch.get("done")
            )
        action_logp = actor.compute_logp(action_dist, batch["action"])
        entropy = actor.compute_entropy(action_dist)
        logp_ratio = action_logp - batch["action_logp"]

        batch["curr_action_dist"] = action_dist
        batch["actor_intermediate"] = _aux  # latents for representation hooks
        batch["curr_action_logp"] = action_logp
        batch["curr_entropy"] = entropy
        batch["action_logp_ratio"] = logp_ratio
        batch["action_prob_ratio"] = jnp.exp(logp_ratio)
        if self.calculate_kl_divergence:
            batch["kl_divergence"] = actor.compute_kl_div(batch["action_dist"], action_dist)

        metrics = {
            "ratio": jax.lax.stop_gradient(jnp.abs(logp_ratio).mean()),
            "entropy": jax.lax.stop_gradient(entropy.mean()),
        }
        return self, batch, None, metrics
