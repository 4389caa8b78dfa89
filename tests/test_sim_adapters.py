"""IsaacLab / mjlab adapter code paths executed against FAKE sim modules
(counterpart of cusrl_test/environment/test_isaaclab.py + test_mjlab.py, which
guard on sim availability; here the sims are duck-typed/monkeypatched in so the
bridging logic — obs-group mapping, autoreset semantics, torch<->numpy
conversion, demonstration sampling, extras-log metrics, launcher glue — runs
without a simulator).  Reference behavior mirrored:
/root/reference/cusrl/environment/isaaclab.py:26-313, mjlab.py:20-255."""

import sys
import types

import numpy as np
import pytest
import torch

from cusrl_tpu.environment.isaaclab import IsaacLabEnvAdapter, IsaacLabEnvLauncher, TrainerCfg, make_isaaclab_env
from cusrl_tpu.environment.mjlab import MjlabEnvAdapter, MjlabPlayer, make_mjlab_env, make_mjlab_env_config


pytestmark = pytest.mark.slow

class _Space:
    def __init__(self, shape):
        self.shape = shape


class _GroupSpace:
    """observation_space with ["policy"]/["critic"] groups and a .spaces dict."""

    def __init__(self, num_envs, policy_dim, critic_dim=None):
        self.spaces = {"policy": _Space((num_envs, policy_dim))}
        if critic_dim is not None:
            self.spaces["critic"] = _Space((num_envs, critic_dim))

    def __getitem__(self, key):
        return self.spaces[key]

    def __contains__(self, key):
        return key in self.spaces


class FakeSimEnv:
    """Duck-typed IsaacLab/mjlab ManagerBasedRlEnv: torch tensors, policy/critic
    obs groups, autoreset with missing final states, extras['log'] metrics."""

    def __init__(self, num_envs=8, obs_dim=6, state_dim=9, act_dim=3, with_motions=False, seed=0):
        self.num_envs = num_envs
        self.device = "cpu"
        self.step_dt = 0.02
        self.observation_space = _GroupSpace(num_envs, obs_dim, state_dim)
        self.action_space = _Space((num_envs, act_dim))
        self._rng = np.random.default_rng(seed)
        self._obs_dim, self._state_dim, self._act_dim = obs_dim, state_dim, act_dim
        self._t = np.zeros(num_envs, np.int64)
        self.closed = False
        self.received_actions = []
        if with_motions:
            self.collect_reference_motions = lambda n: torch.randn(n, obs_dim + act_dim)

    @property
    def unwrapped(self):
        return self

    def _obs(self):
        obs = torch.as_tensor(self._rng.standard_normal((self.num_envs, self._obs_dim)), dtype=torch.float32)
        state = torch.as_tensor(self._rng.standard_normal((self.num_envs, self._state_dim)), dtype=torch.float32)
        return {"policy": obs, "critic": state}

    def reset(self):
        self._t[:] = 0
        return self._obs(), {"log": {}}

    def step(self, action):
        assert isinstance(action, torch.Tensor) and action.dtype == torch.float32
        self.received_actions.append(action)
        self._t += 1
        terminated = torch.as_tensor(self._rng.random(self.num_envs) < 0.05).reshape(-1)
        truncated = torch.as_tensor(self._t >= 25).reshape(-1)
        # Autoreset: finished instances restart immediately; the returned obs is
        # already the FIRST obs of the new episode (final state is missing).
        self._t[np.asarray(terminated | truncated)] = 0
        reward = torch.as_tensor(self._rng.random(self.num_envs), dtype=torch.float32)
        extras = {"log": {"Episode_Reward/tracking": torch.tensor([0.5, 1.5]), "Metrics/feet_air": 2.0}}
        return self._obs(), reward, terminated, truncated, extras

    def close(self):
        self.closed = True


@pytest.mark.parametrize("adapter_cls", [IsaacLabEnvAdapter, MjlabEnvAdapter])
def test_adapter_spec_and_obs_group_mapping(adapter_cls):
    env = adapter_cls(FakeSimEnv())
    assert env.spec.observation_dim == 6
    assert env.spec.state_dim == 9
    assert env.spec.action_dim == 3
    assert env.num_instances == 8
    assert env.spec.autoreset is True
    assert env.spec.final_state_is_missing is True
    assert env.spec.timestep == pytest.approx(0.02)

    obs, state, _ = env.reset()
    assert isinstance(obs, np.ndarray) and obs.shape == (8, 6)
    assert isinstance(state, np.ndarray) and state.shape == (8, 9)


@pytest.mark.parametrize("adapter_cls", [IsaacLabEnvAdapter, MjlabEnvAdapter])
def test_adapter_step_bridges_torch_and_logs_metrics(adapter_cls):
    fake = FakeSimEnv()
    env = adapter_cls(fake)
    env.reset()
    obs, state, reward, terminated, truncated, info = env.step(np.zeros((8, 3), np.float32))
    assert obs.shape == (8, 6) and state.shape == (8, 9)
    assert reward.shape == (8, 1) and reward.dtype == np.float32
    assert terminated.shape == (8, 1) and terminated.dtype == bool
    assert truncated.shape == (8, 1) and truncated.dtype == bool
    assert fake.received_actions and fake.received_actions[0].shape == (8, 3)
    # extras["log"] tensors reduce to scalar means.
    metrics = env.get_metrics()
    assert metrics["Episode_Reward/tracking"] == pytest.approx(1.0)
    assert metrics["Metrics/feet_air"] == pytest.approx(2.0)
    env.close()
    assert fake.closed


def test_adapter_without_critic_group_has_no_state():
    fake = FakeSimEnv()
    fake.observation_space = _GroupSpace(8, 6, None)
    env = IsaacLabEnvAdapter(fake)
    assert env.spec.state_dim is None
    obs, state, _ = env.reset()
    assert state is None


def test_demonstration_sampler_from_collect_reference_motions():
    env = IsaacLabEnvAdapter(FakeSimEnv(with_motions=True))
    sampler = env.spec.demonstration_sampler
    assert sampler is not None
    demo = sampler(5)
    assert isinstance(demo, np.ndarray) and demo.shape == (5, 9)
    # mjlab adapter does not wire demonstrations (reference parity).
    assert MjlabEnvAdapter(FakeSimEnv(with_motions=True)).spec.demonstration_sampler is None


def test_ppo_trains_through_isaaclab_adapter():
    """Full host-loop PPO training through the adapter: executes the autoreset +
    missing-final-state path end to end (2 updates)."""
    import cusrl_tpu
    from tests.helpers import run_training

    env = IsaacLabEnvAdapter(FakeSimEnv())
    factory = cusrl_tpu.PpoAgentFactory(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,))
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert metrics  # update produced metrics


def test_isaaclab_launcher_with_fake_modules(monkeypatch):
    """IsaacLabEnvLauncher app-boot + hydra-cfg + gym.make glue, no Isaac Sim."""
    created = {}

    app_mod = types.ModuleType("isaaclab.app")

    class _App:
        def __init__(self):
            self.closed = False

        def close(self):
            self.closed = True

    class AppLauncher:
        @staticmethod
        def add_app_launcher_args(parser):
            parser.add_argument("--headless", action="store_true")

        def __init__(self, args):
            created["headless"] = args.headless
            self.app = _App()

    app_mod.AppLauncher = AppLauncher
    root_mod = types.ModuleType("isaaclab")
    root_mod.app = app_mod
    tasks_mod = types.ModuleType("isaaclab_tasks")
    parse_mod = types.ModuleType("isaaclab_tasks.utils.parse_cfg")

    class _Cfg:
        pass

    def parse_env_cfg(task, num_envs=None):
        created["task"], created["num_envs"] = task, num_envs
        return _Cfg()

    parse_mod.parse_env_cfg = parse_env_cfg
    utils_mod = types.ModuleType("isaaclab_tasks.utils")
    utils_mod.parse_cfg = parse_mod

    gym_mod = types.ModuleType("gymnasium")

    def gym_make(task, cfg=None):
        created["made"] = (task, cfg)
        created["episode_length_s"] = getattr(cfg, "episode_length_s", None)
        return FakeSimEnv(num_envs=4)

    gym_mod.make = gym_make

    extension_mod = types.ModuleType("robot_ext")
    extension_tasks = types.ModuleType("robot_ext.tasks")
    extension_mod.tasks = extension_tasks

    for name, mod in {
        "isaaclab": root_mod,
        "isaaclab.app": app_mod,
        "isaaclab_tasks": tasks_mod,
        "isaaclab_tasks.utils": utils_mod,
        "isaaclab_tasks.utils.parse_cfg": parse_mod,
        "gymnasium": gym_mod,
        "robot_ext": extension_mod,
        "robot_ext.tasks": extension_tasks,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)

    env = IsaacLabEnvLauncher(
        "Isaac-Velocity-Flat-Anymal-D-v0", num_envs=4, extensions=("robot_ext",), episode_length_s=5.0
    )
    assert created["headless"] is True
    assert created["episode_length_s"] == 5.0  # kwargs overlay applied to the parsed cfg
    assert created["task"] == "Isaac-Velocity-Flat-Anymal-D-v0" and created["num_envs"] == 4
    assert env.num_instances == 4
    app = env._app
    env.close()
    assert app.closed

    # play=True resolves the '-Play' task id variant and disables headless.
    env_play = make_isaaclab_env("Isaac-Velocity-Flat-Anymal-D-v0", num_envs=4, play=True)
    assert created["task"] == "Isaac-Velocity-Flat-Anymal-D-Play-v0"
    assert created["headless"] is False
    env_play.close()


def test_trainer_cfg_builds_trainer(tmp_path):
    import cusrl_tpu

    cfg = TrainerCfg(
        num_iterations=2,
        seed=3,
        agent_factory=cusrl_tpu.PpoAgentFactory(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,)),
        logger=None,
        log_dir=str(tmp_path),
    )
    trainer = cfg(IsaacLabEnvAdapter(FakeSimEnv()))
    assert trainer.num_iterations == 2
    trainer.run_training_loop()


def test_mjlab_player_is_policy_callable():
    import cusrl_tpu

    fake = FakeSimEnv()
    env = MjlabEnvAdapter(fake)
    player = MjlabPlayer(
        environment=env,
        agent_factory=cusrl_tpu.PpoAgentFactory(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,)),
        num_steps=4,
        verbose=False,
    )
    obs_dict = fake._obs()
    action = player(obs_dict)
    assert np.asarray(action).shape == (8, 3)
    # Without mjlab's NativeViewer the playing loop falls back to the framework loop.
    metrics = player.run_playing_loop()
    assert isinstance(metrics, dict)


def test_make_mjlab_env_with_fake_modules(monkeypatch):
    created = {}

    env_mod = types.ModuleType("mjlab.env")

    def manager_env(cfg=None, **kwargs):
        created["cfg"], created["kwargs"] = cfg, kwargs
        return FakeSimEnv(num_envs=4)

    env_mod.ManagerBasedRlEnv = manager_env

    import dataclasses as dc

    envs_mod = types.ModuleType("mjlab.envs")

    @dc.dataclass
    class ManagerBasedRlEnvCfg:
        episode_length_s: float = 10.0
        decimation: int = 2

    envs_mod.ManagerBasedRlEnvCfg = ManagerBasedRlEnvCfg

    registry_mod = types.ModuleType("mjlab.tasks.registry")

    def load_env_cfg(task_id, play=False):
        created["loaded"] = (task_id, play)
        return ManagerBasedRlEnvCfg(episode_length_s=3.0)

    registry_mod.load_env_cfg = load_env_cfg
    tasks_mod = types.ModuleType("mjlab.tasks")
    tasks_mod.registry = registry_mod
    root_mod = types.ModuleType("mjlab")
    root_mod.env = env_mod
    root_mod.envs = envs_mod
    root_mod.tasks = tasks_mod

    for name, mod in {
        "mjlab": root_mod,
        "mjlab.env": env_mod,
        "mjlab.envs": envs_mod,
        "mjlab.tasks": tasks_mod,
        "mjlab.tasks.registry": registry_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)

    cfg = make_mjlab_env_config("Mjlab-Velocity-Flat-Unitree-Go2", play=False)
    assert created["loaded"] == ("Mjlab-Velocity-Flat-Unitree-Go2", False)
    assert cfg.episode_length_s == 3.0 and hasattr(cfg, "device")

    play_cfg = make_mjlab_env_config("Mjlab-Velocity-Flat-Unitree-Go2", play=True)
    assert play_cfg.viewer_type == "viser" and play_cfg.viser_port == 8080

    env = make_mjlab_env("Mjlab-Velocity-Flat-Unitree-Go2", config=cfg, device="cpu")
    assert created["kwargs"] == {"device": "cpu"}
    assert env.num_instances == 4
