"""Hook parameter/activation schedules (counterpart of
cusrl/hook/control/schedule.py:12-77).

``HookParameterSchedule`` drives any mutable field of another hook from an
iteration scheduler (no recompilation — mutable fields are traced leaves);
``HookActivationSchedule`` toggles a hook's active flag (a static change,
recompiles — by design rare).
"""

from __future__ import annotations

from typing import Any, Callable

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["HookActivationSchedule", "HookParameterSchedule"]


class HookParameterSchedule(Hook):
    target_hook: str = static_field(default=None)
    parameter: str = static_field(default=None)
    scheduler: Callable[[int], Any] = static_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        agent.get_hook(self.target_hook)  # raises if missing
        return self if self.name else self.replace(name=f"{self.target_hook}_{self.parameter}_schedule")

    def schedule_is_noop(self, iteration: int) -> bool:
        return False

    def apply_schedule(self, iteration: int, agent=None):
        target = agent.get_hook(self.target_hook)
        value = self.scheduler(iteration)
        agent.update_hook(self.target_hook, target.update_attribute(self.parameter, value))
        return self


class HookActivationSchedule(Hook):
    target_hook: str = static_field(default=None)
    scheduler: Callable[[int], bool] = static_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def init(self, agent, key):
        agent.get_hook(self.target_hook)
        return self if self.name else self.replace(name=f"{self.target_hook}_activation_schedule")

    def schedule_is_noop(self, iteration: int) -> bool:
        return False

    def apply_schedule(self, iteration: int, agent=None):
        target = agent.get_hook(self.target_hook)
        active = bool(self.scheduler(iteration))
        if target.active != active:
            agent.update_hook(self.target_hook, target.with_active(active))
        return self
