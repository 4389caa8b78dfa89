"""Dummy environments for tests and examples (counterpart of
cusrl/testing/environment.py:14-63), shipped inside the package so downstream
users can test against them too.

Two flavors:
* :class:`DummyEnvironment` — host-driven numpy env with ~10% random termination.
* :class:`DummyJaxEnvironment` — the pure-functional equivalent for the
  jitted-scan rollout path (autoresets internally by construction).
"""

from __future__ import annotations

import numpy as np

from cusrl_tpu.template.environment import Environment, EnvironmentSpec, JaxEnvironment

__all__ = ["DummyEnvironment", "DummyJaxEnvironment"]


class DummyEnvironment(Environment):
    """Random observations/rewards; terminates each instance w.p. ``done_prob``."""

    def __init__(
        self,
        observation_dim: int = 8,
        action_dim: int = 4,
        num_instances: int = 4,
        state_dim: int | None = None,
        reward_dim: int = 1,
        done_prob: float = 0.1,
        seed: int = 0,
        **spec_kwargs,
    ):
        super().__init__(
            observation_dim,
            action_dim,
            num_instances,
            state_dim=state_dim,
            reward_dim=reward_dim,
            **spec_kwargs,
        )
        self.done_prob = done_prob
        self._rng = np.random.default_rng(seed)

    def _observe(self):
        n = self.num_instances
        observation = self._rng.standard_normal((n, self.spec.observation_dim), dtype=np.float32)
        state = None
        if self.spec.state_dim is not None:
            state = self._rng.standard_normal((n, self.spec.state_dim), dtype=np.float32)
        return observation, state

    def reset(self, indices=None, *, randomize_episode_progress: bool = False):
        observation, state = self._observe()
        return observation, state, {}

    def step(self, action):
        n = self.num_instances
        observation, state = self._observe()
        reward = self._rng.standard_normal((n, self.spec.reward_dim)).astype(np.float32)
        terminated = (self._rng.random((n, 1)) < self.done_prob).astype(bool)
        truncated = (self._rng.random((n, 1)) < self.done_prob / 2).astype(bool)
        return observation, state, reward, terminated, truncated, {}


class DummyJaxEnvironment(JaxEnvironment):
    """Functional random env: env_state = (key, step_count)."""

    def __init__(
        self,
        observation_dim: int = 8,
        action_dim: int = 4,
        num_instances: int = 4,
        state_dim: int | None = None,
        reward_dim: int = 1,
        done_prob: float = 0.1,
        **spec_kwargs,
    ):
        spec = EnvironmentSpec(
            observation_dim=observation_dim,
            action_dim=action_dim,
            num_instances=num_instances,
            state_dim=state_dim,
            reward_dim=reward_dim,
            **spec_kwargs,
        )
        super().__init__(spec)
        self.done_prob = done_prob

    def init_fn(self, key):
        import jax.numpy as jnp

        return {"key": key, "steps": jnp.zeros((self.num_instances,), jnp.int32)}

    def observe_fn(self, env_state):
        import jax

        n = self.num_instances
        obs_key, state_key = jax.random.split(jax.random.fold_in(env_state["key"], 1))
        observation = jax.random.normal(obs_key, (n, self.spec.observation_dim))
        state = None
        if self.spec.state_dim is not None:
            state = jax.random.normal(state_key, (n, self.spec.state_dim))
        return observation, state

    def step_fn(self, env_state, action, key):
        import jax
        import jax.numpy as jnp

        n = self.num_instances
        reward_key, term_key, trunc_key = jax.random.split(key, 3)
        reward = jax.random.normal(reward_key, (n, self.spec.reward_dim))
        terminated = jax.random.uniform(term_key, (n, 1)) < self.done_prob
        truncated = jax.random.uniform(trunc_key, (n, 1)) < self.done_prob / 2
        done = (terminated | truncated).squeeze(-1)
        new_state = {
            "key": jax.random.fold_in(env_state["key"], 7),
            "steps": jnp.where(done, 0, env_state["steps"] + 1),
        }
        return new_state, reward, terminated, truncated, {}
