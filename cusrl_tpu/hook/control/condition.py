"""Conditional objective activation (counterpart of
cusrl/hook/control/condition.py:10-67).

TPU-native redesign: the reference flips hook ``active`` flags per mini-batch —
a structural change that would retrace every batch.  Here conditions evaluate to
*traced 0/1 scales* written into ``batch["__objective_scales__"]``; the
HookComposite multiplies the controlled hooks' losses by their scale.  Identical
effect, zero recompilation, works inside the minibatch ``lax.scan``.

Conditions are callables ``(metadata, batch) -> bool array`` (traced).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Callable

import jax.numpy as jnp

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["ConditionalObjectiveActivation", "EpochIndexCondition"]


class EpochIndexCondition:
    """True when ``metadata["epoch_index"]`` is in the configured set."""

    def __init__(self, epoch_index: int | Iterable[int]):
        if isinstance(epoch_index, int):
            epoch_index = [epoch_index]
        self.epoch_index = tuple(sorted(set(epoch_index)))

    def __call__(self, metadata, batch):
        current = metadata["epoch_index"]
        result = jnp.zeros((), bool)
        for index in self.epoch_index:
            result = jnp.logical_or(result, current == index)
        return result

    def __hash__(self):
        return hash(self.epoch_index)

    def __eq__(self, other):
        return isinstance(other, EpochIndexCondition) and self.epoch_index == other.epoch_index


class ConditionalObjectiveActivation(Hook):
    """Must be placed before the objective hooks it controls."""

    named_conditions: tuple[tuple[str, Callable], ...] = static_field(default=())
    training_only: bool = static_field(default=True, kw_only=True)

    @staticmethod
    def create(named_conditions: dict[str, Callable] | None = None, **kwargs: Callable):
        merged = dict(named_conditions or {})
        merged.update(kwargs)
        return ConditionalObjectiveActivation(named_conditions=tuple(sorted(merged.items())))

    def init(self, agent, key):
        for hook_name, _ in self.named_conditions:
            agent.get_hook(hook_name)  # raises if missing
        return self

    def objective(self, state, metadata, batch):
        scales = dict(batch.get("__objective_scales__", {}))
        for hook_name, condition in self.named_conditions:
            scales[hook_name] = condition(metadata, batch).astype(jnp.float32)
        batch["__objective_scales__"] = scales
        return self, batch, None, {}
