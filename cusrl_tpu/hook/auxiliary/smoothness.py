"""Action smoothness penalties (counterpart of cusrl/hook/auxiliary/smoothness.py:14-109).

TPU-native formulation: instead of split-and-pad + conv1d over per-episode
segments, finite differences are computed directly on the ``[T, B, A]`` sequence
and pairs spanning an episode boundary are masked out with the done flags —
identical math, static shapes, no repacking:

    1st order:  |a[t+1] - a[t]|            valid unless done[t]
    2nd order:  |a[t+2] - 2 a[t+1] + a[t]| valid unless done[t] or done[t+1]
"""

from __future__ import annotations

import jax.numpy as jnp

from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["ActionSmoothnessLoss"]


def _masked_mean(values, valid):
    weight = valid.astype(jnp.float32)
    return jnp.sum(values * weight) / jnp.maximum(jnp.sum(weight) * values.shape[-1], 1.0)


class ActionSmoothnessLoss(Hook):
    weight_1st_order: float | tuple[float, ...] | None = mutable_field(default=None)
    weight_2nd_order: float | tuple[float, ...] | None = mutable_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def objective(self, state, metadata, batch):
        if not metadata.get("temporal"):
            raise ValueError("ActionSmoothnessLoss requires temporal batches")
        action_mean = batch["curr_action_dist"]["mean"]  # [T, B, A]
        if action_mean.shape[0] < 3:
            raise ValueError(f"Sequences need >= 3 steps; got {action_mean.shape[0]}")
        done = batch["done"]  # [T, B, 1] bool
        not_boundary = jnp.logical_not(done)

        objectives = {}
        if self.weight_1st_order is not None:
            w1 = jnp.asarray(self.weight_1st_order, jnp.float32)
            diff1 = jnp.abs(action_mean[1:] - action_mean[:-1])
            valid1 = not_boundary[:-1]
            objectives["action_smoothness_1st_order_loss"] = _masked_mean(
                jnp.sum(w1 * diff1, axis=-1, keepdims=True), valid1
            )
        if self.weight_2nd_order is not None:
            w2 = jnp.asarray(self.weight_2nd_order, jnp.float32)
            diff2 = jnp.abs(action_mean[2:] - 2.0 * action_mean[1:-1] + action_mean[:-2])
            valid2 = jnp.logical_and(not_boundary[:-2], not_boundary[1:-1])
            objectives["action_smoothness_2nd_order_loss"] = _masked_mean(
                jnp.sum(w2 * diff2, axis=-1, keepdims=True), valid2
            )
        return self, batch, (objectives or None), {}
