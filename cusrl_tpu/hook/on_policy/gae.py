"""Generalized Advantage Estimation (counterpart of cusrl/hook/on_policy/gae.py:8-111).

The reference's reverse Python loop becomes a reverse ``lax.scan`` — XLA keeps the
whole recurrence on device in float32.  Supports the DNA dual-lambda variant
(distinct ``lamda_value`` for return targets) and per-epoch ``recompute`` (only
meaningful with temporal batches, where the batch retains its time axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook, validate_concrete

__all__ = ["GeneralizedAdvantageEstimation", "generalized_advantage_estimation"]


def generalized_advantage_estimation(reward, done, value, next_value, gamma, lamda):
    """Reverse-scan GAE over ``[T, N, Dr]`` float32 arrays.

    Matches the reference recurrence exactly (gae.py:8-20):
        A[t] = delta[t] + (1 - done[t]) * gamma * lamda * A[t+1]
        delta[t] = r[t] + gamma * V'[t] - V[t]
    """
    reward = reward.astype(jnp.float32)
    value = value.astype(jnp.float32)
    next_value = next_value.astype(jnp.float32)
    not_done = 1.0 - done.astype(jnp.float32)
    delta = reward + gamma * next_value - value

    def body(carry, x):
        delta_t, not_done_t = x
        advantage_t = delta_t + not_done_t * gamma * lamda * carry
        return advantage_t, advantage_t

    _, advantage = jax.lax.scan(body, jnp.zeros_like(delta[0]), (delta, not_done), reverse=True)
    return advantage


class GeneralizedAdvantageEstimation(Hook):
    gamma: float = mutable_field(default=0.99)
    lamda: float = mutable_field(default=0.95)
    lamda_value: float | None = mutable_field(default=None)
    recompute: bool = static_field(default=False)
    training_only: bool = static_field(default=True, kw_only=True)

    def __post_init__(self):
        validate_concrete(lambda g: 0 <= g < 1, self.gamma, f"'gamma' must be in [0, 1); got {self.gamma}")
        validate_concrete(lambda l: 0 <= l <= 1, self.lamda, f"'lamda' must be in [0, 1]; got {self.lamda}")
        validate_concrete(
            lambda l: 0 <= l <= 1, self.lamda_value, f"'lamda_value' must be in [0, 1]; got {self.lamda_value}"
        )

    def _compute(self, data: dict) -> dict:
        advantage = generalized_advantage_estimation(
            data["reward"], data["done"], data["value"], data["next_value"], self.gamma, self.lamda
        )
        if self.lamda_value is None:
            returns = data["value"].astype(jnp.float32) + advantage
        else:
            value_advantage = generalized_advantage_estimation(
                data["reward"], data["done"], data["value"], data["next_value"], self.gamma, self.lamda_value
            )
            returns = data["value"].astype(jnp.float32) + value_advantage
        return {**data, "advantage": advantage, "return": returns}

    def pre_update(self, state, rollout):
        if not self.recompute:
            rollout = self._compute(rollout)
        return self, rollout, {}

    def objective(self, state, metadata, batch):
        if self.recompute:
            if not metadata.get("temporal"):
                raise RuntimeError("GAE recompute requires temporal batches (time axis intact)")
            batch = self._compute(batch)  # inputs are buffer constants; no grad path
        return self, batch, None, {}
