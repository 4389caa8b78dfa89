"""Environment contracts (counterpart of cusrl/template/environment.py:24-379).

Two flavors, unified by one spec:

* :class:`Environment` — the host-driven ABC matching the reference's vectorized
  contract (``reset(indices)`` / ``step(action)`` on numpy-ish arrays).  Used for
  Gym adapters and external simulators; the Trainer drives it with a Python loop
  around jitted act/step.

* :class:`JaxEnvironment` — the TPU-native fast path: a *pure-functional* env
  (``init_fn(key) -> env_state``, ``step_fn(env_state, action, key) -> ...``)
  that the Trainer fuses with the policy into ONE ``lax.scan`` rollout entirely
  on device.  JAX envs autoreset inside ``step`` by construction.

``EnvironmentSpec`` carries the declarative properties hooks key off (dims,
autoreset, mirror fns, normalization stat groups, ``observation_is_subset_of_state``,
``final_state_is_missing``, ``demonstration_sampler``, timestep).
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from collections.abc import Callable, Iterable
from typing import Any

import numpy as np

__all__ = [
    "Environment",
    "EnvironmentSpec",
    "JaxEnvironment",
    "get_done_indices",
    "update_observation_and_state",
]


@dataclasses.dataclass
class EnvironmentSpec:
    """Declarative environment properties (cusrl/template/environment.py:118-175)."""

    observation_dim: int
    action_dim: int
    num_instances: int = 1
    state_dim: int | None = None
    reward_dim: int = 1
    autoreset: bool = False
    final_state_is_missing: bool = False
    timestep: float | None = None

    # Spaces (kept loosely typed; only adapters populate them)
    observation_space: Any = None
    action_space: Any = None

    # Symmetry transformations: callables array -> mirrored array
    mirror_observation: Callable | None = None
    mirror_state: Callable | None = None
    mirror_action: Callable | None = None

    # Predefined export-time statistics: (scale, shift) pairs
    observation_normalization: tuple[Any, Any] | None = None
    state_normalization: tuple[Any, Any] | None = None
    action_denormalization: tuple[Any, Any] | None = None

    # Online-normalization structure
    observation_normalization_excluded_indices: tuple[int, ...] | None = None
    state_normalization_excluded_indices: tuple[int, ...] | None = None
    observation_stat_groups: tuple[tuple[int, ...], ...] = ()
    state_stat_groups: tuple[tuple[int, ...], ...] = ()
    observation_is_subset_of_state: Any = None

    # Imitation
    demonstration_sampler: Callable[[int], Any] | None = None

    environment_instance: Any = None
    extras: dict[str, Any] = dataclasses.field(default_factory=dict)

    def get(self, key: str, default=None):
        if hasattr(self, key):
            return getattr(self, key)
        return self.extras.get(key, default)

    @property
    def has_state(self) -> bool:
        return self.state_dim is not None


class Environment(ABC):
    """Host-driven vectorized environment ABC.

    ``reset(indices=None) -> (observation, state | None, info)``
    ``step(action) -> (next_obs, next_state, reward[N,Dr], terminated[N,1], truncated[N,1], info)``
    """

    Spec = EnvironmentSpec

    def __init__(
        self,
        observation_dim: int,
        action_dim: int,
        num_instances: int,
        state_dim: int | None = None,
        **spec_kwargs: Any,
    ):
        known = {f.name for f in dataclasses.fields(EnvironmentSpec)}
        extras = {k: v for k, v in spec_kwargs.items() if k not in known}
        spec_kwargs = {k: v for k, v in spec_kwargs.items() if k in known}
        self.spec = EnvironmentSpec(
            observation_dim=observation_dim,
            action_dim=action_dim,
            num_instances=num_instances,
            state_dim=state_dim,
            environment_instance=self,
            extras=extras,
            **spec_kwargs,
        )

    @property
    def num_instances(self) -> int:
        return self.spec.num_instances

    @abstractmethod
    def reset(self, indices=None, *, randomize_episode_progress: bool = False):
        raise NotImplementedError

    @abstractmethod
    def step(self, action):
        raise NotImplementedError

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state_dict: dict) -> None:
        pass

    def close(self) -> None:
        pass


class JaxEnvironment:
    """Pure-functional environment for the jitted-scan rollout path.

    Subclasses implement::

        init_fn(key)                      -> env_state  (pytree, leaves [N, ...])
        observe_fn(env_state)             -> (observation, state | None)
        step_fn(env_state, action, key)   -> (env_state, reward, terminated, truncated, info)

    ``step_fn`` must AUTORESET internally: when an instance terminates or
    truncates, the returned ``env_state`` already holds the next episode's start
    while reward/terminated/truncated describe the finished transition.  Shapes:
    reward ``[N, reward_dim]``, terminated/truncated ``[N, 1]`` bool.
    ``info`` is a (possibly empty) dict of extra per-step arrays.
    """

    def __init__(self, spec: EnvironmentSpec):
        spec.autoreset = True
        spec.environment_instance = self
        self.spec = spec

    @property
    def num_instances(self) -> int:
        return self.spec.num_instances

    def init_fn(self, key):
        raise NotImplementedError

    def observe_fn(self, env_state):
        raise NotImplementedError

    def step_fn(self, env_state, action, key):
        raise NotImplementedError

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state_dict: dict) -> None:
        pass

    def close(self) -> None:
        pass


def get_done_indices(terminated, truncated) -> np.ndarray:
    """Indices of instances that finished this step (host-side helper)."""
    done = np.asarray(terminated).reshape(-1) | np.asarray(truncated).reshape(-1)
    return np.nonzero(done)[0]


def update_observation_and_state(observation, state, new_observation, new_state, indices):
    """Writes partial resets into the running observation/state arrays."""
    observation = np.asarray(observation).copy()
    observation[indices] = np.asarray(new_observation)[indices]
    if state is not None and new_state is not None:
        state = np.asarray(state).copy()
        state[indices] = np.asarray(new_state)[indices]
    return observation, state
