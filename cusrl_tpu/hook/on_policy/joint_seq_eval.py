"""Fused actor+critic SEQUENCE evaluation for recurrent/transformer backbones
(TPU-only optimization; no reference counterpart — same role as
JointPolicyValueEvaluation for MLPs, cusrl evaluates the two backbones
separately in cusrl/hook/on_policy/common.py:12-49 + value.py:85-145).

The PPO presets build the actor and critic with IDENTICAL backbone
architectures (same pytree structure, same static config, different weights).
The update's objective fold runs two whole-sequence passes per minibatch —
twice the elementwise/LayerNorm fusions, twice the kernel launches.  This
hook stacks the two module pytrees leaf-wise and evaluates both with ONE
``jax.vmap`` over the stack axis: every matmul becomes a [2, ...] batched
matmul, every elementwise chain fuses once, and the lane/banded attention
kernels batch through their vmap rule.  Gradients flow to both parameter sets
through the stack (stack is differentiable), exactly as the MLP hook's
per-layer weight stacking.

Downstream, OnPolicyPreparation / ValueLoss detect the precomputed
``curr_action_dist`` / ``curr_value`` and skip their own passes; the loss
math is unchanged (equality-tested in tests/test_joint_seq_eval.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook
from cusrl_tpu.utils.dict_utils import get_first

__all__ = ["JointSequentialEvaluation"]


def _stackable(actor_backbone, critic_backbone) -> str | None:
    """None when the two backbones can be vmapped as one stack, else why not."""
    if not (actor_backbone.is_recurrent and critic_backbone.is_recurrent):
        return "both backbones must be recurrent (use JointPolicyValueEvaluation for MLPs)"
    try:
        a_leaves, a_def = jax.tree.flatten(actor_backbone)
        c_leaves, c_def = jax.tree.flatten(critic_backbone)
    except Exception as error:  # noqa: BLE001
        return f"backbones not flattenable: {error}"
    if a_def != c_def:
        return "backbone structures/static configs differ"
    for a, c in zip(a_leaves, c_leaves):
        if jnp.shape(a) != jnp.shape(c) or jnp.asarray(a).dtype != jnp.asarray(c).dtype:
            return "backbone leaf shapes/dtypes differ"
    return None


class JointSequentialEvaluation(Hook):
    """Precomputes ``curr_action_dist``/``curr_value`` with vmapped stacked
    recurrent backbones.  Must precede ValueLoss and OnPolicyPreparation in
    the hook list (the PPO presets handle this)."""

    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        reason = _stackable(agent.actor.backbone, agent.critic.backbone)
        if reason is not None:
            raise ValueError(
                f"JointSequentialEvaluation requires stackable backbones: {reason}. "
                "Disable fuse_actor_critic_evaluation for this architecture."
            )
        if getattr(agent.critic, "action_aware", False):
            raise ValueError("JointSequentialEvaluation does not support action-aware critics")
        return self

    def objective(self, state, metadata, batch):
        if not metadata.get("temporal", False):
            # Recurrent agents sample temporally; leave non-temporal batches
            # to the standard per-module paths.
            return self, batch, None, {}
        actor, critic = state.actor, state.critic
        observation = batch["observation"]
        critic_input = get_first(batch, "state", "observation").astype(observation.dtype)
        actor_memory = jax.tree.map(lambda m: m[0], batch["actor_memory"])
        critic_memory = jax.tree.map(lambda m: m[0], batch["critic_memory"])
        done = batch.get("done")

        stacked = jax.tree.map(lambda a, c: jnp.stack([a, c]), actor.backbone, critic.backbone)
        xs = jnp.stack([observation, critic_input])  # [2, T, B, C]
        mems = jax.tree.map(lambda a, c: jnp.stack([a, c]), actor_memory, critic_memory)

        def apply(module, x, memory):
            latent, _, _ = module(x, memory, sequential=True, done=done)
            return latent

        latents = jax.vmap(apply)(stacked, xs, mems)  # [2, T, B, E]

        batch["curr_action_dist"] = actor.distribution(latents[0])
        batch["actor_intermediate"] = {"backbone.output": latents[0]}
        batch["curr_value"] = critic.head(latents[1].astype(jnp.float32))
        return self, batch, None, {}
