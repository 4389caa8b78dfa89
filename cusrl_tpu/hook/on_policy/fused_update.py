"""Fully-fused PPO objective: backbones + heads + loss + analytic backward in
ONE Pallas kernel per minibatch (TPU-only optimization; no reference
counterpart — the reference computes the same losses as separate torch ops in
cusrl/hook/on_policy/{common.py:12-49, ppo.py:10-85, value.py:85-145}).

:class:`FusedPpoUpdate` replaces the JointPolicyValueEvaluation →
ValueLoss → OnPolicyPreparation → PpoSurrogateLoss → EntropyLoss span of the
PPO hook suite with a single objective that calls
:func:`cusrl_tpu.nn.kernels.fused_ppo_step.fused_ppo_step`.  The kernel keeps
every intermediate (hidden activations, latents, means, values, logp) in
VMEM/registers — nothing but parameter-gradient accumulators and four scalar
metrics ever touch HBM — eliminating the per-minibatch XLA "tail" the
saved-activation pair kernel still pays for.

Loss math and metric names are identical to the hooks it replaces
(``surrogate_loss``/``value_loss``/``entropy_loss`` objectives;
``ratio``/``entropy``/``value`` metrics); equality is enforced by
tests/test_fused_ppo_step.py.  Entropy of the state-independent-std Gaussian
depends only on ``std`` and stays in XLA (its gradient reaches ``std_param``
through the bijector); the kernel's ``std`` cotangent chains the same way.

Preconditions (validated at init): same-shape feedforward MLP backbones,
NormalDist with biased mean head, biased non-action-aware critic head, no
hooks downstream that read the prepared-batch entries this fold skips
(``curr_action_dist``/``curr_entropy``/...).  Off TPU (and under a device
mesh) the objective lowers to an XLA reference with identical numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.hook.on_policy.joint_eval import _fusable
from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook, validate_concrete
from cusrl_tpu.utils.dict_utils import get_first

__all__ = ["FusedPpoUpdate"]

_LOG_SQRT_2PI = 0.9189385332046727  # 0.5 * log(2*pi)


class FusedPpoUpdate(Hook):
    """One-kernel PPO+value objective (surrogate + clipped/MSE value + entropy).

    Mutable knobs mirror the hooks it replaces: ``clip_ratio`` / ``weight``
    from PpoSurrogateLoss, ``value_loss_weight`` from ValueLoss,
    ``entropy_loss_weight`` from EntropyLoss.  ``value_loss_clip`` is static
    (changes the kernel program).
    """

    clip_ratio: float = mutable_field(default=0.2)
    weight: float = mutable_field(default=1.0)
    value_loss_weight: float = mutable_field(default=0.5)
    entropy_loss_weight: float = mutable_field(default=0.01)
    value_loss_clip: float | None = static_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def __post_init__(self):
        validate_concrete(lambda c: c > 0, self.clip_ratio, "'clip_ratio' must be positive")
        validate_concrete(lambda w: w >= 0, self.weight, "'weight' must be non-negative")
        validate_concrete(lambda w: w > 0, self.value_loss_weight, "'value_loss_weight' must be positive")
        validate_concrete(lambda w: w >= 0, self.entropy_loss_weight, "'entropy_loss_weight' must be non-negative")
        validate_concrete(lambda c: c > 0, self.value_loss_clip, "'value_loss_clip' must be positive or None")

    def init(self, agent, key):
        from cusrl_tpu.nn.module.distribution import NormalDist

        reason = _fusable(agent.actor.backbone, agent.critic.backbone)
        if reason is not None:
            raise ValueError(
                f"FusedPpoUpdate requires fusable backbones: {reason}. "
                "Disable fused_ppo_update for this architecture."
            )
        dist = agent.actor.distribution
        if type(dist) is not NormalDist:
            raise ValueError(
                "FusedPpoUpdate requires a NormalDist actor (state-independent std); "
                f"got {type(dist).__name__}. Disable fused_ppo_update."
            )
        if dist.mean_head.bias is None or agent.critic.head.bias is None:
            raise ValueError("FusedPpoUpdate requires biased mean/value heads")
        if getattr(agent.critic, "action_aware", False):
            raise ValueError("FusedPpoUpdate does not support action-aware critics")
        return self

    def objective(self, state, metadata, batch):
        from cusrl_tpu.nn.kernels.fused_ppo_step import fused_ppo_step

        actor, critic = state.actor, state.critic
        backbone = actor.backbone
        dist = actor.distribution
        observation = batch["observation"]
        critic_input = get_first(batch, "state", "observation")

        # Leading batch dims carry no information for scalar losses: flatten.
        xa = observation.reshape(-1, observation.shape[-1])
        xc = critic_input.reshape(-1, critic_input.shape[-1]).astype(xa.dtype)
        action = batch["action"].reshape(xa.shape[0], -1)
        old_logp = batch["action_logp"].reshape(xa.shape[0], -1)
        advantage = batch["advantage"].reshape(xa.shape[0], -1)
        returns = batch["return"].reshape(xa.shape[0], -1)
        if advantage.shape[-1] != 1:
            raise ValueError(f"Expected advantage with shape [..., 1]; got {batch['advantage'].shape}")
        old_value = None
        if self.value_loss_clip is not None:
            old_value = batch["value"].reshape(xa.shape[0], -1)

        std = dist.bijector(dist.std_param.astype(jnp.float32)).reshape(-1)

        # The kernel engages exactly when the plain backbone would have
        # (TPU, bf16 layers, no mesh, supported activation/depth); otherwise
        # fused_ppo_step lowers to its XLA reference — same math either way.
        use_pallas = backbone._can_fuse(xa)
        loss_core, (surrogate_loss, value_loss, ratio, value_mean) = fused_ppo_step(
            xa,
            xc,
            tuple(l.weight.T for l in backbone.layers),
            tuple(l.bias[None, :] for l in backbone.layers),
            tuple(l.weight.T for l in critic.backbone.layers),
            tuple(l.bias[None, :] for l in critic.backbone.layers),
            dist.mean_head.weight.T,
            dist.mean_head.bias[None, :],
            critic.head.weight.T,
            critic.head.bias[None, :],
            std,
            action,
            old_logp,
            advantage,
            old_value,
            returns,
            self.clip_ratio,
            self.weight,
            self.value_loss_weight,
            backbone.activation,
            backbone.ends_with_activation,
            loss_clip=self.value_loss_clip,
            use_pallas=use_pallas,
        )

        # Entropy of the state-independent-std Gaussian is batch-independent
        # (XLA expression; gradient reaches std_param through the bijector).
        entropy = jnp.sum(jnp.log(std) + 0.5 + _LOG_SQRT_2PI)
        entropy_loss = -entropy * self.entropy_loss_weight

        objectives = {
            "fused_surrogate_value_loss": loss_core,
            "entropy_loss": entropy_loss,
        }
        metrics = {
            "surrogate_loss": surrogate_loss,
            "value_loss": value_loss,
            "ratio": ratio,
            "entropy": jax.lax.stop_gradient(entropy),
            "value": value_mean,
        }
        return self, batch, objectives, metrics
