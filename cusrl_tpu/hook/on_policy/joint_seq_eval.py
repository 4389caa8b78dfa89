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


def _pair_parts(backbone):
    """(encoder_layer, mlp_tail | None, memory_key | None) when the backbone
    has the pair-kernel-eligible shape (a CausalTransformerEncoderLayer,
    optionally followed by one feedforward Mlp tail), else (None, None, None)."""
    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayer
    from cusrl_tpu.nn.module.mlp import Mlp
    from cusrl_tpu.nn.module.sequential import Sequential

    if isinstance(backbone, CausalTransformerEncoderLayer):
        return backbone, None, None
    if (
        isinstance(backbone, Sequential)
        and len(backbone.modules) == 2
        and isinstance(backbone.modules[0], CausalTransformerEncoderLayer)
        and isinstance(backbone.modules[1], Mlp)
    ):
        return backbone.modules[0], backbone.modules[1], "0"
    return None, None, None


class JointSequentialEvaluation(Hook):
    """Precomputes ``curr_action_dist``/``curr_value`` for recurrent agents.

    Transformer backbones in the pair-kernel-eligible shape take the
    PAIR-KERNEL route (round 5): both pre chains in one Pallas program, ONE
    lane-attention call over the env-concatenated halves, both post chains in
    one program (nn/module/causal_attn.fused_pair_sequence) — halving kernel
    launches per minibatch step.  Everything else falls back to the vmapped
    leaf-stack evaluation (measured 5% slower than separate passes at 1-layer
    transformer depth, docs/ROADMAP.md — which is why this hook defaults off
    for non-pair-eligible backbones).

    Must precede ValueLoss and OnPolicyPreparation in the hook list (the PPO
    presets handle this)."""

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

        layer_a, tail_a, mem_key_a = _pair_parts(actor.backbone)
        layer_c, tail_c, mem_key_c = _pair_parts(critic.backbone)
        if (
            layer_a is not None
            and layer_c is not None
            and (tail_a is None) == (tail_c is None)
            and layer_a._fused_eligible(observation, True)
            and layer_c._fused_eligible(critic_input, True)
        ):
            latent_a, latent_c = self._pair_eval(
                layer_a, layer_c, tail_a, tail_c, mem_key_a, mem_key_c,
                observation, critic_input, actor_memory, critic_memory, done,
            )
        else:
            stacked = jax.tree.map(lambda a, c: jnp.stack([a, c]), actor.backbone, critic.backbone)
            xs = jnp.stack([observation, critic_input])  # [2, T, B, C]
            mems = jax.tree.map(lambda a, c: jnp.stack([a, c]), actor_memory, critic_memory)

            def apply(module, x, memory):
                latent, _, _ = module(x, memory, sequential=True, done=done)
                return latent

            latents = jax.vmap(apply)(stacked, xs, mems)  # [2, T, B, E]
            latent_a, latent_c = latents[0], latents[1]

        batch["curr_action_dist"] = actor.distribution(latent_a)
        batch["actor_intermediate"] = {"backbone.output": latent_a}
        batch["curr_value"] = critic.head(latent_c.astype(jnp.float32))
        return self, batch, None, {}

    @staticmethod
    def _pair_eval(layer_a, layer_c, tail_a, tail_c, mem_key_a, mem_key_c,
                   observation, critic_input, actor_memory, critic_memory, done):
        from cusrl_tpu.nn.module.causal_attn import fused_pair_sequence

        mem_a = actor_memory if mem_key_a is None else actor_memory[mem_key_a]
        mem_c = critic_memory if mem_key_c is None else critic_memory[mem_key_c]
        if done is None:
            done = jnp.zeros((*observation.shape[:2], 1), bool)
        la, lc, _, _ = fused_pair_sequence(
            layer_a, layer_c, observation, critic_input, mem_a, mem_c, done
        )
        if tail_a is None:
            return la, lc
        # MLP tails as one pair kernel when both fuse (input grads DO flow
        # back through the block chain here); else the modules' own paths.
        rows = la.shape[0] * la.shape[1]
        la_flat, lc_flat = la.reshape(rows, -1), lc.reshape(rows, -1)
        if tail_a._can_fuse(la_flat) and tail_c._can_fuse(lc_flat) and (
            tail_a.activation == tail_c.activation
            and tail_a.ends_with_activation == tail_c.ends_with_activation
            and tuple(l.weight.shape for l in tail_a.layers) == tuple(l.weight.shape for l in tail_c.layers)
        ):
            from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair

            ta, tc = fused_mlp_pair(
                la_flat, lc_flat,
                tuple(l.weight.T for l in tail_a.layers), tuple(l.bias[None, :] for l in tail_a.layers),
                tuple(l.weight.T for l in tail_c.layers), tuple(l.bias[None, :] for l in tail_c.layers),
                tail_a.activation, tail_a.ends_with_activation, skip_input_grad=False,
            )
            return ta.reshape(*la.shape[:2], -1), tc.reshape(*lc.shape[:2], -1)
        ta, _, _ = tail_a(la, sequential=True)
        tc, _, _ = tail_c(lc, sequential=True)
        return ta, tc
