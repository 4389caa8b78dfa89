"""IsaacLab environment adapter (counterpart of cusrl/environment/isaaclab.py:26-313).

Import-guarded: IsaacLab (Omniverse) is CUDA-hosted and not present in this
image; the adapter is API-complete and bridges torch tensors on the sim side to
numpy at the framework boundary.  Characteristics mirrored from the reference:
``policy``/``critic`` observation groups map to observation/state, the sim
autoresets (``autoreset=True``) and omits final states
(``final_state_is_missing=True``), AMP demonstration sampling comes from
``collect_reference_motions``, and per-step metrics arrive via ``extras["log"]``.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Sequence

import numpy as np

from cusrl_tpu.template.environment import Environment

__all__ = ["IsaacLabEnvAdapter", "IsaacLabEnvLauncher", "TrainerCfg", "make_isaaclab_env"]


def _to_numpy(value):
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


class IsaacLabEnvAdapter(Environment):
    def __init__(self, wrapped):
        self.wrapped = wrapped
        unwrapped = getattr(wrapped, "unwrapped", wrapped)
        obs_space = unwrapped.observation_space["policy"]
        observation_dim = int(np.prod(obs_space.shape[1:]))
        action_dim = int(np.prod(unwrapped.action_space.shape[1:]))
        state_dim = None
        if "critic" in getattr(unwrapped.observation_space, "spaces", {}):
            state_dim = int(np.prod(unwrapped.observation_space["critic"].shape[1:]))

        demonstration_sampler = None
        if hasattr(unwrapped, "collect_reference_motions"):
            demonstration_sampler = lambda n: _to_numpy(unwrapped.collect_reference_motions(n))

        super().__init__(
            observation_dim=observation_dim,
            action_dim=action_dim,
            num_instances=unwrapped.num_envs,
            state_dim=state_dim,
            autoreset=True,
            final_state_is_missing=True,
            timestep=getattr(unwrapped, "step_dt", None),
            demonstration_sampler=demonstration_sampler,
        )
        self._last_extras: dict = {}

    def _split_obs(self, obs_dict):
        observation = _to_numpy(obs_dict["policy"]).reshape(self.num_instances, -1)
        state = None
        if self.spec.state_dim is not None:
            state = _to_numpy(obs_dict["critic"]).reshape(self.num_instances, -1)
        return observation, state

    def reset(self, indices=None, *, randomize_episode_progress: bool = False):
        obs_dict, extras = self.wrapped.reset()
        observation, state = self._split_obs(obs_dict)
        return observation, state, extras

    def step(self, action):
        import torch

        device = getattr(self.wrapped.unwrapped, "device", "cuda")
        action_t = torch.as_tensor(np.asarray(action), device=device, dtype=torch.float32)
        obs_dict, reward, terminated, truncated, extras = self.wrapped.step(action_t)
        observation, state = self._split_obs(obs_dict)
        self._last_extras = extras or {}
        return (
            observation,
            state,
            _to_numpy(reward).reshape(-1, 1).astype(np.float32),
            _to_numpy(terminated).reshape(-1, 1).astype(bool),
            _to_numpy(truncated).reshape(-1, 1).astype(bool),
            {},
        )

    def get_metrics(self) -> dict[str, float]:
        log = self._last_extras.get("log") or {}
        return {key: float(_to_numpy(value).mean()) for key, value in log.items()}

    def close(self):
        self.wrapped.close()


class IsaacLabEnvLauncher(IsaacLabEnvAdapter):
    """Boots the Isaac Sim AppLauncher + Hydra config in-process, then wraps the
    created env (isaaclab.py:138-201)."""

    def __init__(
        self,
        task: str,
        num_envs: int | None = None,
        headless: bool = True,
        play: bool = False,
        extensions: Sequence[str] = (),
        **kwargs: Any,
    ):
        try:
            from isaaclab.app import AppLauncher
        except ImportError as error:  # pragma: no cover
            raise ImportError("IsaacLabEnvLauncher requires an IsaacLab installation") from error

        parser = argparse.ArgumentParser()
        AppLauncher.add_app_launcher_args(parser)
        args, _ = parser.parse_known_args([])
        args.headless = headless and not play
        self._app = AppLauncher(args).app

        import importlib

        import gymnasium as gym
        import isaaclab_tasks  # noqa: F401  (registers tasks)
        from isaaclab_tasks.utils.parse_cfg import parse_env_cfg

        for extension in extensions:
            # Extra task providers (e.g. robot_lab) register their gym tasks on import.
            importlib.import_module(f"{extension}.tasks")

        env_cfg = parse_env_cfg(task, num_envs=num_envs)
        for key, value in kwargs.items():
            setattr(env_cfg, key, value)
        super().__init__(gym.make(task, cfg=env_cfg))

    def close(self):
        super().close()
        if self._app is not None:
            self._app.close()


@dataclasses.dataclass
class TrainerCfg:
    """rsl-rl-style trainer config bridge (isaaclab.py:218-313): lets IsaacLab
    workflows carry cusrl_tpu agent settings inside their Hydra configs."""

    num_iterations: int = 1000
    checkpoint_interval: int = 50
    seed: int = 0
    agent_factory: Any = None
    logger: str | None = "tensorboard"
    log_dir: str = "logs"
    experiment_name: str = "isaaclab"

    def __call__(self, environment: Environment, checkpoint: dict | None = None):
        from cusrl_tpu.template.logger import LoggerFactory
        from cusrl_tpu.template.trainer import Trainer
        from cusrl_tpu.utils.misc import set_global_seed

        set_global_seed(self.seed)
        backend = None if self.logger in (None, "none") else self.logger
        return Trainer(
            environment=environment,
            agent_factory=self.agent_factory,
            num_iterations=self.num_iterations,
            logger_factory=LoggerFactory(backend=backend, log_dir=self.log_dir),
            checkpoint_interval=self.checkpoint_interval,
            experiment_name=self.experiment_name,
            checkpoint=checkpoint,
        )


def make_isaaclab_env(
    task: str, num_envs: int | None = None, play: bool = False, **kwargs: Any
) -> IsaacLabEnvLauncher:
    """Create an IsaacLab env; ``play=True`` selects the registered '-Play'
    evaluation variant of the task (counterpart of
    cusrl/environment/isaaclab.py:205-214)."""
    if play:
        ids = task.split("-")
        ids.insert(-1, "Play")
        task = "-".join(ids)
    return IsaacLabEnvLauncher(task, num_envs=num_envs, play=play, **kwargs)
