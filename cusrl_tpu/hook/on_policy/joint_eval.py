"""Fused actor+critic batch evaluation (TPU-only optimization; no reference
counterpart — the reference evaluates the two backbones separately in
cusrl/hook/on_policy/common.py:12-49 and cusrl/hook/on_policy/value.py:85-145).

In the PPO presets the actor and critic backbones are same-shape MLPs.  The
update step's dominant cost is their two forward+backward passes over each
minibatch — a chain of *small* matmuls that underutilize the MXU.  This hook
evaluates both backbones as ONE stacked computation: per layer, the two weight
matrices are stacked into ``[2, out, in]`` and applied with a single batched
matmul over the stacked ``[2, B, in]`` activations (the first layer contracts
to one wider matmul because both networks read the same-width input).  Halves
the number of matmul kernels in the objective fold's forward *and* backward.

Downstream, :class:`OnPolicyPreparation` and :class:`ValueLoss` detect the
precomputed ``curr_action_dist`` / ``curr_value`` entries and skip their own
forward passes; all loss math is unchanged.  Gradients flow to both parameter
sets through the stack.  Opt in via ``PpoAgentFactory(
fuse_actor_critic_evaluation=True)``; requires feedforward same-shape MLP
backbones (validated at init).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.nn.module.mlp import Mlp
from cusrl_tpu.template.hook import Hook
from cusrl_tpu.utils.dict_utils import get_first

__all__ = ["JointPolicyValueEvaluation"]


def _stacked_linear(x, weight, bias, compute_dtype):
    """Applies stacked Linear layers: x [K, ..., in], weight [K, out, in].

    Mirrors nn/layer/linear.py:84-96 exactly — low-precision operands with
    float32 accumulation, bias added in float32, output cast back down.
    """
    if compute_dtype is not None:
        dtype = jnp.dtype(compute_dtype)
        y = jnp.einsum(
            "k...i,koi->k...o",
            x.astype(dtype),
            weight.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        if bias is not None:
            y = y + bias[(slice(None),) + (None,) * (y.ndim - 2)]
        return y.astype(dtype)
    y = jnp.einsum(
        "k...i,koi->k...o",
        x.astype(jnp.float32),
        weight,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias[(slice(None),) + (None,) * (y.ndim - 2)]
    return y


def _fusable(actor_backbone, critic_backbone) -> str | None:
    """Returns None when the two backbones can be evaluated stacked, else the
    reason they cannot."""
    if not isinstance(actor_backbone, Mlp) or not isinstance(critic_backbone, Mlp):
        return "both backbones must be feedforward Mlp modules"
    if actor_backbone.activation != critic_backbone.activation:
        return "backbone activations differ"
    if actor_backbone.ends_with_activation != critic_backbone.ends_with_activation:
        return "ends_with_activation differs"
    if len(actor_backbone.layers) != len(critic_backbone.layers):
        return "backbone depths differ"
    for la, lc in zip(actor_backbone.layers, critic_backbone.layers):
        if la.weight.shape != lc.weight.shape:
            return f"layer shapes differ ({la.weight.shape} vs {lc.weight.shape})"
        if (la.bias is None) != (lc.bias is None):
            return "bias configuration differs"
        if la.compute_dtype != lc.compute_dtype:
            return "compute dtypes differ"
    return None


class JointPolicyValueEvaluation(Hook):
    """Precomputes ``curr_action_dist``/``curr_value`` with stacked backbones.

    Must be placed before :class:`ValueLoss` and :class:`OnPolicyPreparation`
    in the hook list (the PPO preset handles this).
    """

    training_only: bool = static_field(default=True, kw_only=True)
    # Optionally fold the fp32 distribution-mean and value heads into the pair
    # kernel (fused_mlp_pair_heads).  Measured on v5e: SLOWER than the default
    # (8.1M vs 9.0M env-steps/s at the bench config) — XLA already fuses the
    # tiny head matmuls straight into the loss elementwise chain, so the
    # kernel only adds a padded [rows, action_dim] materialization boundary.
    # Kept as a validated option for architectures with wider heads.
    fuse_heads: bool = static_field(default=False)
    expose_latent: bool = static_field(default=False)

    def init(self, agent, key):
        reason = _fusable(agent.actor.backbone, agent.critic.backbone)
        if reason is not None:
            raise ValueError(
                f"JointPolicyValueEvaluation requires fusable backbones: {reason}. "
                "Disable fuse_actor_critic_evaluation for this architecture."
            )
        if getattr(agent.critic, "action_aware", False):
            raise ValueError("JointPolicyValueEvaluation does not support action-aware critics")
        hook = self
        if hook.fuse_heads:
            from cusrl_tpu.nn.module.distribution import NormalDist

            dist = agent.actor.distribution
            heads_ok = (
                type(dist) is NormalDist
                and dist.mean_head.bias is not None
                and agent.critic.head.bias is not None
            )
            if not heads_ok:
                hook = hook.replace(fuse_heads=False)
        return hook

    def post_init(self, agent):
        if not self.fuse_heads:
            return self
        # Representation hooks probe the actor latent: keep exposing it (its
        # cotangent flows back through the kernel).
        needs_latent = any(
            h.active and getattr(h, "latent_name", None) is not None for h in agent.state.hooks
        )
        return self.replace(expose_latent=bool(needs_latent))

    def objective(self, state, metadata, batch):
        actor = state.actor
        critic = state.critic
        observation = batch["observation"]
        critic_input = get_first(batch, "state", "observation")

        if actor.backbone._can_fuse(observation):
            # The Pallas pair kernel operates on 2-D [rows, features]; flatten
            # any leading batch dims (e.g. temporal [T, Ns, D] minibatches) and
            # restore them on the outputs.
            lead = observation.shape[:-1]
            restore = (lambda a: a.reshape(lead + a.shape[-1:])) if len(lead) != 1 else (lambda a: a)
            observation = observation.reshape(-1, observation.shape[-1])
            critic_input = critic_input.reshape(-1, critic_input.shape[-1])
            ab, cb = actor.backbone, critic.backbone
            backbone_args = (
                observation,
                critic_input.astype(observation.dtype),
                tuple(l.weight.T for l in ab.layers),
                tuple(l.bias[None, :] for l in ab.layers),
                tuple(l.weight.T for l in cb.layers),
                tuple(l.bias[None, :] for l in cb.layers),
                ab.activation,
                ab.ends_with_activation,
            )
            if self.fuse_heads:
                # Backbones + fp32 heads in ONE kernel per row tile: XLA only
                # sees [rows, A] means and [rows, 1] values.
                from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair_heads

                dist = actor.distribution
                outs = fused_mlp_pair_heads(
                    *backbone_args[:6],
                    dist.mean_head.weight.T,
                    dist.mean_head.bias[None, :],
                    critic.head.weight.T,
                    critic.head.bias[None, :],
                    backbone_args[6],
                    backbone_args[7],
                    skip_input_grad=True,
                    expose_latent=self.expose_latent,
                )
                mean, value = restore(outs[0]), restore(outs[1])
                # Mirrors NormalDist.__call__ (std is latent-independent; its
                # gradient flows to std_param through this XLA expression).
                std = dist.bijector(dist.std_param.astype(jnp.float32))
                batch["curr_action_dist"] = {"mean": mean, "std": jnp.broadcast_to(std, mean.shape)}
                batch["curr_value"] = value
                if self.expose_latent:
                    batch["actor_intermediate"] = {"backbone.output": restore(outs[2])}
                return self, batch, None, {}

            # Both same-shape chains run in ONE Pallas kernel invocation per
            # row tile (fused_mlp_pair) — one pipeline ramp instead of two,
            # and the input tile is loaded once when actor and critic read the
            # same observation.  Observations/states are rollout data, never
            # differentiated: the backward kernel skips the first layer's dX.
            from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair

            actor_latent, critic_latent = fused_mlp_pair(*backbone_args, skip_input_grad=True)
            actor_latent, critic_latent = restore(actor_latent), restore(critic_latent)
            batch["curr_action_dist"] = actor.distribution(actor_latent)
            batch["actor_intermediate"] = {"backbone.output": actor_latent}
            batch["curr_value"] = critic.head(critic_latent.astype(jnp.float32))
            return self, batch, None, {}

        x = jnp.stack([observation, critic_input.astype(observation.dtype)])
        actor_layers = actor.backbone.layers
        critic_layers = critic.backbone.layers
        act = actor.backbone.activation_fn
        num_layers = len(actor_layers)
        for index, (la, lc) in enumerate(zip(actor_layers, critic_layers)):
            weight = jnp.stack([la.weight, lc.weight])
            bias = None if la.bias is None else jnp.stack([la.bias, lc.bias])
            x = _stacked_linear(x, weight, bias, la.compute_dtype)
            if index < num_layers - 1 or actor.backbone.ends_with_activation:
                x = act(x)
        actor_latent, critic_latent = x[0], x[1]

        batch["curr_action_dist"] = actor.distribution(actor_latent)
        batch["actor_intermediate"] = {"backbone.output": actor_latent}
        batch["curr_value"] = critic.head(critic_latent.astype(jnp.float32))
        return self, batch, None, {}
