"""Evaluation/deployment loop (counterpart of cusrl/template/player.py:24-290).

Loads a checkpoint, puts the agent in inference mode, and steps the environment
with optional real-time pacing; terminates on ``num_steps``, per-instance
``num_episodes``, or SIGINT (graceful).  ``PlayerHook``s observe every step and
reset.  Works with both host environments and JaxEnvironments (driven stepwise).
"""

from __future__ import annotations

import signal
from typing import Any

import numpy as np

from cusrl_tpu.template.environment import Environment, JaxEnvironment, get_done_indices
from cusrl_tpu.utils import distributed
from cusrl_tpu.utils.metrics import Metrics
from cusrl_tpu.utils.timing import Rate

__all__ = ["Player", "PlayerHook"]


class PlayerHook:
    def init(self, player: "Player") -> None:
        pass

    def step(self, player: "Player", transition: dict[str, Any]) -> None:
        pass

    def reset(self, player: "Player", indices) -> None:
        pass

    def close(self, player: "Player") -> None:
        pass


class _JaxEnvAdapter:
    """Drives a JaxEnvironment stepwise for evaluation."""

    def __init__(self, env: JaxEnvironment, seed: int = 0):
        import jax

        self.env = env
        self.spec = env.spec
        self.num_instances = env.num_instances
        self._key = jax.random.key(seed)
        self._env_state = None
        self._step_jit = jax.jit(env.step_fn)

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def reset(self, indices=None, **kwargs):
        if self._env_state is None or indices is None:
            self._env_state = self.env.init_fn(self._next_key())
        observation, state = self.env.observe_fn(self._env_state)
        return np.asarray(observation), None if state is None else np.asarray(state), {}

    def step(self, action):
        import jax.numpy as jnp

        self._env_state, reward, terminated, truncated, info = self._step_jit(
            self._env_state, jnp.asarray(action), self._next_key()
        )
        observation, state = self.env.observe_fn(self._env_state)
        return (
            np.asarray(observation),
            None if state is None else np.asarray(state),
            np.asarray(reward),
            np.asarray(terminated),
            np.asarray(truncated),
            info,
        )

    def close(self):
        self.env.close()


class Player:
    def __init__(
        self,
        environment: Environment | JaxEnvironment,
        agent_factory,
        checkpoint: dict[str, Any] | None = None,
        deterministic: bool = True,
        num_steps: int | None = None,
        num_episodes: int | None = None,
        timestep: float | None = None,
        hooks: tuple[PlayerHook, ...] = (),
        verbose: bool = True,
    ):
        raw_env = environment() if callable(environment) and not hasattr(environment, "spec") else environment
        self.environment = _JaxEnvAdapter(raw_env) if isinstance(raw_env, JaxEnvironment) else raw_env
        self.agent = agent_factory.from_environment(self.environment)
        if checkpoint is not None:
            self.agent.load_state_dict(checkpoint.get("agent", checkpoint))
        self.agent.set_inference_mode(deterministic=deterministic)
        self.num_steps = num_steps
        self.num_episodes = num_episodes
        self.hooks = tuple(hooks)
        self.verbose = verbose
        self.metrics = Metrics()
        if timestep is None:
            timestep = self.environment.spec.timestep
        self.rate = Rate(1.0 / timestep) if timestep else Rate(0.0)
        self._stop = False

    def _handle_sigint(self, *_args) -> None:
        self._stop = True

    def run_playing_loop(self) -> dict[str, float]:
        for hook in self.hooks:
            hook.init(self)
        previous_handler = signal.signal(signal.SIGINT, self._handle_sigint)
        try:
            return self._run()
        finally:
            signal.signal(signal.SIGINT, previous_handler)
            for hook in self.hooks:
                hook.close(self)

    def _run(self) -> dict[str, float]:
        env = self.environment
        observation, state, _ = env.reset()
        episode_counts = np.zeros(env.num_instances, dtype=np.int64)
        episode_rewards: list[float] = []
        episode_lengths: list[float] = []
        cum_reward = np.zeros(env.num_instances)
        cum_length = np.zeros(env.num_instances)
        step = 0
        self.rate.reset()

        while not self._stop:
            action = self.agent.act(observation, state)
            observation, state, reward, terminated, truncated, info = env.step(action)
            self.agent.step(observation, reward, terminated, truncated, next_state=state)
            transition = {"reward": reward, "terminated": terminated, "truncated": truncated}
            for hook in self.hooks:
                hook.step(self, transition)

            cum_reward += np.asarray(reward).sum(-1)
            cum_length += 1
            self.metrics.record(step_reward=np.asarray(reward).mean())
            done_indices = get_done_indices(terminated, truncated)
            if done_indices.size:
                episode_counts[done_indices] += 1
                episode_rewards.extend(cum_reward[done_indices].tolist())
                episode_lengths.extend(cum_length[done_indices].tolist())
                cum_reward[done_indices] = 0
                cum_length[done_indices] = 0
                if not env.spec.autoreset:
                    new_obs, new_state, _ = env.reset(indices=done_indices)
                    observation = np.asarray(observation).copy()
                    observation[done_indices] = np.asarray(new_obs)[done_indices]
                    if state is not None and new_state is not None:
                        state = np.asarray(state).copy()
                        state[done_indices] = np.asarray(new_state)[done_indices]
                for hook in self.hooks:
                    hook.reset(self, done_indices)

            step += 1
            if self.num_steps is not None and step >= self.num_steps:
                break
            if self.num_episodes is not None and (episode_counts >= self.num_episodes).all():
                break
            self.rate.tick()

        if episode_rewards:
            self.metrics.record(episode_reward=episode_rewards, episode_length=episode_lengths)
        get_metrics = getattr(env, "get_metrics", None)
        if get_metrics is not None:
            self.metrics.record(get_metrics())
        summary = self.metrics.summary()
        if self.verbose and distributed.is_main_process():
            width = max((len(k) for k in summary), default=10) + 2
            print("┌" + "─" * (width + 14) + "┐")
            for key, value in summary.items():
                print(f"│ {key:<{width}}{value:>10.4f}  │")
            print("└" + "─" * (width + 14) + "┘")
        return summary
