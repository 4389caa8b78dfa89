"""mjlab (MuJoCo-warp) environment adapter (counterpart of
cusrl/environment/mjlab.py:20-255).

Import-guarded — mjlab is CUDA-hosted.  Same shape as the IsaacLab adapter
(policy/critic groups, autoreset, missing final states, episode log metrics)
plus :class:`MjlabPlayer`, which exposes the agent as a policy *callable* driven
by mjlab's own native/viser viewers instead of a framework-run loop.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from cusrl_tpu.template.environment import Environment
from cusrl_tpu.template.player import Player

__all__ = ["MjlabEnvAdapter", "MjlabPlayer", "make_mjlab_env"]


def _to_numpy(value):
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


class MjlabEnvAdapter(Environment):
    def __init__(self, wrapped):
        self.wrapped = wrapped
        unwrapped = getattr(wrapped, "unwrapped", wrapped)
        obs_space = unwrapped.observation_space["policy"]
        observation_dim = int(np.prod(obs_space.shape[1:]))
        action_dim = int(np.prod(unwrapped.action_space.shape[1:]))
        state_dim = None
        if "critic" in getattr(unwrapped.observation_space, "spaces", {}):
            state_dim = int(np.prod(unwrapped.observation_space["critic"].shape[1:]))
        super().__init__(
            observation_dim=observation_dim,
            action_dim=action_dim,
            num_instances=unwrapped.num_envs,
            state_dim=state_dim,
            autoreset=True,
            final_state_is_missing=True,
            timestep=getattr(unwrapped, "step_dt", None),
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


class MjlabPlayer(Player):
    """A Player that IS the policy callable: mjlab's viewers drive the loop and
    call this object per frame with the observation dict (mjlab.py:137-227)."""

    def __call__(self, observation_dict):
        observation = _to_numpy(observation_dict["policy"]).reshape(self.environment.num_instances, -1)
        state = None
        if self.environment.spec.state_dim is not None and "critic" in observation_dict:
            state = _to_numpy(observation_dict["critic"]).reshape(self.environment.num_instances, -1)
        return self.agent.act(observation, state)

    def run_playing_loop(self) -> dict[str, float]:
        try:
            from mjlab.viewer import NativeViewer  # type: ignore
        except ImportError:
            return super().run_playing_loop()
        viewer = NativeViewer(self.environment.wrapped, policy=self)  # pragma: no cover
        viewer.run()  # pragma: no cover
        return self.metrics.summary()  # pragma: no cover


def make_mjlab_env(
    id: str, config: Any = None, argv: Sequence[str] = (), play: bool = False, **kwargs: Any
) -> MjlabEnvAdapter:
    try:
        from mjlab.env import ManagerBasedRlEnv  # type: ignore
    except ImportError as error:  # pragma: no cover
        raise ImportError("make_mjlab_env requires an mjlab installation") from error
    if config is None:  # pragma: no cover
        config = make_mjlab_env_config(id, play=play)
    env = ManagerBasedRlEnv(cfg=config, **kwargs)  # pragma: no cover
    return MjlabEnvAdapter(env)  # pragma: no cover


def make_mjlab_env_config(id: str, play: bool = False) -> Any:
    """Resolve a registered mjlab task config by name (counterpart of
    cusrl/environment/mjlab.py:228-246): load the registry's env cfg and wrap
    it in a dataclass that adds the ``device`` field (plus viewer fields for
    ``play`` mode) expected by ``ManagerBasedRlEnv``."""
    try:  # pragma: no cover - requires an mjlab installation
        import dataclasses as _dc

        from mjlab.envs import ManagerBasedRlEnvCfg  # type: ignore
        from mjlab.tasks.registry import load_env_cfg  # type: ignore
    except ImportError as error:  # pragma: no cover
        raise ImportError("make_mjlab_env_config requires an mjlab installation") from error

    @_dc.dataclass  # pragma: no cover
    class ManagerBasedRlEnvCfgWithDevice(ManagerBasedRlEnvCfg):  # type: ignore[misc]
        device: Any = None

    @_dc.dataclass  # pragma: no cover
    class ManagerBasedRlEnvPlayCfg(ManagerBasedRlEnvCfgWithDevice):
        headless: bool = False
        viewer_type: Any = "viser"
        viser_host: str = "0.0.0.0"
        viser_port: int = 8080

    config_class = ManagerBasedRlEnvPlayCfg if play else ManagerBasedRlEnvCfgWithDevice  # pragma: no cover
    env_cfg = load_env_cfg(id, play=play)  # pragma: no cover
    config_kwargs = {field.name: getattr(env_cfg, field.name) for field in _dc.fields(env_cfg)}  # pragma: no cover
    return config_class(**config_kwargs)  # pragma: no cover
