"""Post-update on-policy statistics (counterpart of cusrl/hook/on_policy/stats.py:10-40).

Runs one batched policy pass over the whole rollout after the update, recording
post-update KL divergence, importance-weighted advantage and action std.  The
KL-based LR schedules recompute the same KL themselves — XLA CSE dedupes the
shared subexpression, so this costs nothing extra inside the jitted update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["OnPolicyStatistics", "compute_rollout_kl"]


def compute_rollout_kl(state, rollout):
    """Mean KL(old || current) over the whole [T, N] rollout (sequence mode).

    Caches the result in the rollout dict: OnPolicyStatistics and the KL LR
    schedules both need this full-rollout actor pass, and XLA does not CSE the
    (custom-call) Pallas kernels the pass lowers to — without the cache the
    98k-row forward would run twice per update."""
    cached = rollout.get("__post_update_kl__")
    if cached is not None and cached[0] is state.actor:  # same traced actor object
        return cached[1]
    actor = state.actor
    memory = rollout.get("actor_memory")
    if memory is not None:
        memory = jax.tree.map(lambda m: m[0], memory)
    action_dist, _, _ = actor(
        rollout["observation"], memory, sequential=actor.is_recurrent, done=rollout.get("done")
    )
    kl = actor.compute_kl_div(rollout["action_dist"], action_dist)
    result = (jnp.mean(kl), action_dist)
    rollout["__post_update_kl__"] = (state.actor, result)
    return result


class OnPolicyStatistics(Hook):
    training_only: bool = static_field(default=True, kw_only=True)

    def post_update(self, state, rollout, snapshot):
        actor = state.actor
        kl_mean, action_dist = compute_rollout_kl(state, rollout)
        action_logp = actor.compute_logp(action_dist, rollout["action"])
        logp_ratio = action_logp - rollout["action_logp"]
        metrics = {
            "kl_divergence": kl_mean,
            "importance_weighted_advantage": jnp.mean(
                rollout["advantage"] * jnp.exp(logp_ratio)
            ),
        }
        if "std" in action_dist:
            metrics["action_std"] = jnp.mean(action_dist["std"])
        return self, state, metrics
