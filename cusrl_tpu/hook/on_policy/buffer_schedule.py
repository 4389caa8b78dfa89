"""Rollout-length schedule (counterpart of cusrl/hook/on_policy/buffer_schedule.py:10-31).

Resizing the buffer changes the jitted update's [T] dimension — a recompile —
so schedules should change capacity rarely (e.g. a few times over training).
"""

from __future__ import annotations

from typing import Callable

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["OnPolicyBufferCapacitySchedule"]


class OnPolicyBufferCapacitySchedule(Hook):
    schedule: Callable[[int], int] = static_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def schedule_is_noop(self, iteration: int) -> bool:
        return False

    def apply_schedule(self, iteration: int, agent=None):
        capacity = int(self.schedule(iteration))
        agent.num_steps_per_update = capacity
        agent.resize_buffer(capacity)
        return self
