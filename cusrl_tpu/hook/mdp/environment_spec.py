"""Environment-spec override hooks (counterpart of
cusrl/hook/mdp/environment_spec.py:10-59).

Overrides apply at hook-init time — before any LATER hook reads the spec (place
these first in the hook list, as the reference's presets do).  Structural dims
(observation/action) are fixed by then; override behavioral attributes (mirror
fns, stat groups, autoreset flags, normalization stats, ...).
"""

from __future__ import annotations

from typing import Any, Callable

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["DynamicEnvironmentSpecOverride", "EnvironmentSpecOverride"]


class EnvironmentSpecOverride(Hook):
    overrides: tuple[tuple[str, Any], ...] = static_field(default=())

    @staticmethod
    def create(overrides: dict[str, Any] | None = None, **kwargs: Any) -> "EnvironmentSpecOverride":
        merged = dict(overrides or {})
        merged.update(kwargs)
        return EnvironmentSpecOverride(overrides=tuple(sorted(merged.items())))

    def init(self, agent, key):
        for name, value in self.overrides:
            setattr(agent.environment_spec, name, value)
        return self


class DynamicEnvironmentSpecOverride(Hook):
    overrides_factory: Callable = static_field(default=None)

    def init(self, agent, key):
        spec = agent.environment_spec
        if spec.environment_instance is None:
            raise ValueError("'environment_instance' is not set in the environment_spec")
        for name, value in self.overrides_factory(spec.environment_instance).items():
            setattr(spec, name, value)
        return self
