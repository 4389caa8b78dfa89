"""Agent base (counterpart of cusrl/template/agent.py:25-391).

The host-side shell around the jitted compute: IO-format preservation (numpy in ->
numpy out), metrics accumulation, iteration/update cadence bookkeeping, inference
mode, and tolerant checkpointing of the device-resident state pytree.

The reference's autocast/GradScaler configuration disappears by design: on TPU the
compute dtype is bfloat16 (configured per-module via CONFIG.compute_dtype) and no
loss scaling is needed; float32 islands are structural (distribution math, value
heads, GAE) rather than context-managed.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Any

import jax
import numpy as np

from cusrl_tpu.template.environment import EnvironmentSpec
from cusrl_tpu.utils.metrics import Metrics
from cusrl_tpu.utils.misc import new_key

__all__ = ["Agent", "AgentFactory"]


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Agent(ABC):
    def __init__(
        self,
        environment_spec: EnvironmentSpec,
        num_steps_per_update: int,
        name: str = "Agent",
    ):
        self.environment_spec = environment_spec
        self.num_steps_per_update = int(num_steps_per_update)
        self.name = name

        self.observation_dim = environment_spec.observation_dim
        self.action_dim = environment_spec.action_dim
        self.state_dim = environment_spec.state_dim or environment_spec.observation_dim
        self.parallelism = environment_spec.num_instances

        self.iteration = 0
        self.step_index = 0
        self.inference_mode = False
        self.deterministic = False
        self.metrics = Metrics()
        self.transition: dict[str, Any] = {}
        self._key = new_key()
        self._numpy_io = False

    # -- RNG ------------------------------------------------------------------

    _KEY_BUFFER_SIZE = 256

    def next_key(self) -> jax.Array:
        """Returns a fresh PRNG key; splits in batches so the per-call device
        dispatch cost is amortized 1/256 (matters over remote-TPU tunnels)."""
        buffer = getattr(self, "_key_buffer", None)
        if not buffer:
            keys = jax.random.split(self._key, self._KEY_BUFFER_SIZE + 1)
            self._key = keys[0]
            self._key_buffer = buffer = list(keys[1:])
        return buffer.pop()

    # -- IO format preservation (cusrl/template/agent.py:376-391) -------------

    def _observe_io_format(self, value: Any) -> None:
        self._numpy_io = isinstance(value, np.ndarray)

    def _restore_io_format(self, value: Any) -> Any:
        if self._numpy_io:
            return jax.tree.map(lambda x: np.asarray(x), value)
        return value

    # -- lifecycle -------------------------------------------------------------

    @abstractmethod
    def act(self, observation, state=None):
        raise NotImplementedError

    def step(self, next_observation, reward, terminated, truncated, next_state=None, **kwargs) -> bool:
        self.step_index += 1
        return not self.inference_mode and self.step_index >= self.num_steps_per_update

    def update(self) -> dict[str, float]:
        self.step_index = 0
        self.iteration += 1
        summary = self.metrics.summary()
        self.metrics.clear()
        return summary

    def record(self, metrics_dict: dict | None = None, /, **kwargs) -> None:
        self.metrics.record(metrics_dict, **kwargs)

    def set_inference_mode(self, deterministic: bool = True) -> None:
        self.inference_mode = True
        self.deterministic = deterministic

    def set_iteration(self, iteration: int) -> None:
        self.iteration = int(iteration)

    # -- checkpointing ---------------------------------------------------------

    def state_dict(self) -> dict[str, Any]:
        return {"iteration": self.iteration}

    def load_state_dict(self, state_dict: dict[str, Any]) -> None:
        if "iteration" in state_dict:
            self.set_iteration(int(state_dict["iteration"]))

    @classmethod
    def warn(cls, message: str) -> None:
        import warnings

        from cusrl_tpu.utils import distributed

        if distributed.is_main_process():
            # A real warning (catchable/filterable by callers and tests), plus
            # the reference's red console line for interactive visibility.
            warnings.warn(f"{cls.__name__}: {message}", RuntimeWarning, stacklevel=3)


@dataclasses.dataclass(kw_only=True)
class AgentFactory(ABC):
    """Factory dataclass contract (cusrl/template/agent.py AgentFactory)."""

    num_steps_per_update: int = 24
    name: str = "Agent"

    @abstractmethod
    def __call__(self, environment_spec: EnvironmentSpec) -> Agent:
        raise NotImplementedError

    def from_environment(self, environment) -> Agent:
        return self(environment.spec)
