"""KL-targeted learning-rate control (counterpart of
cusrl/hook/on_policy/lr_schedule.py:19-296, rsl-rl style).

Functional re-design for jit:
* The LR scale is a 0-d array field on the hook; applying it rewrites
  ``state.learning_rates`` (0-d arrays consumed by the optimizer facade), so LR
  adaptation happens entirely on device with no recompilation.
* **Update rejection** becomes trivial: the pre-update (actor, critic, hooks,
  opt_state) snapshot is just a value, and a masked
  ``tree.map(where(reject, old, new))`` restores all of it — including sibling
  hook statefuls (RMS statistics etc.), matching the reference's full
  ``load_state_dict`` restore (lr_schedule.py:56-80).  The composite replaces
  this hook's own entry with the fold's returned self afterwards, preserving
  the adapted ``lr_scale`` across a rejection exactly as the reference does.
* Post-update KL is recomputed here over the full rollout; XLA CSE merges it
  with OnPolicyStatistics' identical pass.

Distributed: the KL mean over the data-sharded rollout is already global.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.hook.on_policy.stats import compute_rollout_kl
from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["AdaptiveLRSchedule", "MiniBatchWiseLRSchedule", "ThresholdLRSchedule"]


class _KLDivergenceBasedLRSchedule(Hook):
    desired_kl_divergence: float = mutable_field(default=0.01)
    max_kl_divergence: float | None = static_field(default=None, kw_only=True)
    scale_all_params: bool = static_field(default=False, kw_only=True)
    warmup_iterations: int = static_field(default=0, kw_only=True)
    initial_scale: float = static_field(default=0.0, kw_only=True)
    lr_scale: jax.Array | float = mutable_field(default=1.0)
    target_groups: tuple[str, ...] = static_field(default=(), kw_only=True)
    base_lrs: tuple[tuple[str, float], ...] = static_field(default=(), kw_only=True)
    training_only: bool = static_field(default=True, kw_only=True)

    def post_init(self, agent):
        if self.scale_all_params:
            groups = tuple(agent.optimizer.group_names)
        else:
            # Groups containing actor parameters (reference scales actor groups).
            labels = agent.optimizer.labels_flat  # path -> group
            actor_groups = {g for path, g in labels.items() if path.startswith("actor")}
            groups = tuple(sorted(actor_groups)) or tuple(agent.optimizer.group_names)
        base = tuple((g, float(agent.optimizer.base_learning_rates[g])) for g in groups)
        return self.replace(target_groups=groups, base_lrs=base)

    def _apply_scale(self, state, lr_scale):
        base = dict(self.base_lrs)
        new_lrs = dict(state.learning_rates)
        for group in self.target_groups:
            new_lrs[group] = base[group] * lr_scale
        return state.replace(learning_rates=new_lrs)

    def _compute_scale(self, kl: jax.Array):
        """Returns (new_self, multiplicative scale array)."""
        raise NotImplementedError

    def post_update(self, state, rollout, snapshot):
        kl, _ = compute_rollout_kl(state, rollout)
        metrics = {}

        warm = state.iteration >= self.warmup_iterations
        new_self, scale = self._compute_scale(kl)
        lr_scale = jnp.where(warm, jnp.asarray(self.lr_scale, jnp.float32) * scale, self.lr_scale)
        new_self = new_self.replace(lr_scale=lr_scale)
        state = new_self._apply_scale(state, lr_scale)
        metrics["lr_scale"] = lr_scale

        if self.max_kl_divergence is not None:
            snap_actor, snap_critic, snap_hooks, snap_opt = snapshot
            reject = kl > self.max_kl_divergence
            restore = lambda old, new: jax.tree.map(lambda o, n: jnp.where(reject, o, n), old, new)
            # Full-state restore mirroring the reference's load_state_dict
            # (cusrl/hook/on_policy/lr_schedule.py:69-80): modules, optimizer,
            # AND hook statefuls (e.g. RMS statistics accumulated this update).
            # The composite overwrites this hook's own entry with ``new_self``
            # afterwards, which is exactly the reference's "preserve lr_scale
            # across the restore" behavior.
            state = state.replace(
                actor=restore(snap_actor, state.actor),
                critic=restore(snap_critic, state.critic),
                hooks=restore(snap_hooks, state.hooks),
                opt_state=restore(snap_opt, state.opt_state),
            )
            metrics["update_rejected"] = reject.astype(jnp.float32)
        metrics["kl_divergence"] = kl
        return new_self, state, metrics

    def apply_schedule(self, iteration: int, agent=None):
        if self.schedule_is_noop(iteration):
            return self
        progress = min(iteration, self.warmup_iterations) / self.warmup_iterations
        return self.replace(lr_scale=self.initial_scale + (1.0 - self.initial_scale) * progress)

    def schedule_is_noop(self, iteration: int) -> bool:
        return self.warmup_iterations <= 0 or iteration > self.warmup_iterations


class ThresholdLRSchedule(_KLDivergenceBasedLRSchedule):
    """Scale LR down/up by ``scale_factor`` when KL leaves the threshold band."""

    threshold: float = static_field(default=1.2, kw_only=True)
    scale_factor: float = static_field(default=1.1, kw_only=True)

    def _compute_scale(self, kl):
        desired = jnp.asarray(self.desired_kl_divergence, jnp.float32)
        scale = jnp.where(
            kl > desired * self.threshold,
            1.0 / self.scale_factor,
            jnp.where(kl < desired / self.threshold, self.scale_factor, 1.0),
        )
        return self, scale


class AdaptiveLRSchedule(_KLDivergenceBasedLRSchedule):
    """Integrates log KL error; rescales once the accumulator crosses a threshold."""

    threshold: float = static_field(default=1.0, kw_only=True)
    scale_factor: float = static_field(default=0.2, kw_only=True)
    accumulated_log_error: jax.Array | float = mutable_field(default=0.0)
    error_count: jax.Array | float = mutable_field(default=0.0)

    def _compute_scale(self, kl):
        kl = jnp.maximum(kl, 1e-5)
        desired = jnp.asarray(self.desired_kl_divergence, jnp.float32)
        acc = jnp.asarray(self.accumulated_log_error, jnp.float32) + jnp.log(kl / desired)
        count = jnp.asarray(self.error_count, jnp.float32) + 1.0
        trigger = jnp.abs(acc) >= self.threshold
        avg = acc / count
        scale = jnp.where(trigger, jnp.exp(-jnp.clip(avg, -1.0, 1.0) * self.scale_factor), 1.0)
        new_self = self.replace(
            accumulated_log_error=jnp.where(trigger, 0.0, acc),
            error_count=jnp.where(trigger, 0.0, count),
        )
        return new_self, scale


class MiniBatchWiseLRSchedule(ThresholdLRSchedule):
    """Per-mini-batch threshold LR control (rsl-rl style).

    Requires ``OnPolicyPreparation(calculate_kl_divergence=True)`` — flipped on
    automatically at post_init.  The scale is computed in ``objective`` from the
    batch KL and applied to ``state.learning_rates`` in ``pre_optim`` (the hook
    point that may edit state).
    """

    threshold: float = static_field(default=2.0, kw_only=True)
    scale_factor: float = static_field(default=1.5, kw_only=True)
    scale_all_params: bool = static_field(default=True, kw_only=True)

    def post_init(self, agent):
        from cusrl_tpu.hook.on_policy.common import OnPolicyPreparation

        for hook in agent.state.hooks:
            if isinstance(hook, OnPolicyPreparation) and not hook.calculate_kl_divergence:
                agent.update_hook(hook.hook_name, hook.replace(calculate_kl_divergence=True))
        return super().post_init(agent)

    def post_update(self, state, rollout, snapshot):
        return self, state, {}

    def objective(self, state, metadata, batch):
        if "kl_divergence" not in batch:
            raise RuntimeError("MiniBatchWiseLRSchedule requires 'kl_divergence' from OnPolicyPreparation")
        kl = jax.lax.stop_gradient(jnp.mean(batch["kl_divergence"]))
        _, scale = ThresholdLRSchedule._compute_scale(self, kl)
        warm = state.iteration >= self.warmup_iterations
        lr_scale = jnp.where(warm, jnp.asarray(self.lr_scale, jnp.float32) * scale, self.lr_scale)
        return self.replace(lr_scale=lr_scale), batch, None, {"lr_scale": lr_scale}

    def pre_optim(self, state, grads):
        state = self._apply_scale(state, jnp.asarray(self.lr_scale, jnp.float32))
        return self, state, grads, {}
