"""Advantage post-processing hooks (counterpart of cusrl/hook/on_policy/advantage.py).

Distributed note: buffer-wise normalization statistics are computed inside the
jitted update over the globally-sharded rollout, so the mean/var are global by
construction — the explicit ``reduce_mean_var_`` collective of the reference
(advantage.py:108-116) is implicit here.
"""

from __future__ import annotations

import jax.numpy as jnp

from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["AdvantageNormalization", "AdvantageReduction"]


def _standardize(advantage):
    advantage = advantage.astype(jnp.float32)
    axes = tuple(range(advantage.ndim - 1))
    mean = advantage.mean(axis=axes)
    var = advantage.var(axis=axes)
    return (advantage - mean) / jnp.sqrt(var + 1e-8)


class AdvantageNormalization(Hook):
    mini_batch_wise: bool = static_field(default=False)
    training_only: bool = static_field(default=True, kw_only=True)

    def pre_update(self, state, rollout):
        if not self.mini_batch_wise:
            rollout = {**rollout, "advantage": _standardize(rollout["advantage"])}
        return self, rollout, {}

    def objective(self, state, metadata, batch):
        if self.mini_batch_wise:
            batch["advantage"] = _standardize(batch["advantage"])
        return self, batch, None, {}


class AdvantageReduction(Hook):
    """Weighted sum/mean reduction of multi-reward advantages to a scalar."""

    reduction: str = static_field(default="sum")
    weight: tuple[float, ...] | None = mutable_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def objective(self, state, metadata, batch):
        advantage = batch["advantage"]
        if self.weight is not None:
            advantage = advantage * jnp.asarray(self.weight, advantage.dtype)
        if self.reduction == "sum":
            advantage = advantage.sum(-1, keepdims=True)
        elif self.reduction == "mean":
            advantage = advantage.mean(-1, keepdims=True)
        else:
            raise ValueError(f"Unsupported reduction '{self.reduction}'")
        batch["advantage"] = advantage
        return self, batch, None, {}
