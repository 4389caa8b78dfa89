"""Trainer/Player/Logger/Trial integration tests."""

import os

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.template.logger import LoggerFactory, load_checkpoint_file
from cusrl_tpu.template.player import Player
from cusrl_tpu.template.trainer import Trainer
from cusrl_tpu.template.trial import Trial
from cusrl_tpu.testing import DummyEnvironment, DummyJaxEnvironment


def make_factory(**kwargs):
    defaults = dict(
        num_steps_per_update=8,
        actor_hidden_dims=(32,),
        critic_hidden_dims=(32,),
        sampler_epochs=1,
        sampler_mini_batches=2,
    )
    defaults.update(kwargs)
    return cusrl_tpu.PpoAgentFactory(**defaults)


def test_trainer_host_env(tmp_path):
    env = DummyEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    trainer = Trainer(
        environment=env,
        agent_factory=make_factory(),
        num_iterations=2,
        logger_factory=LoggerFactory(log_dir=str(tmp_path)),
        checkpoint_interval=1,
        experiment_name="host_test",
        verbose=False,
    )
    trainer.run_training_loop()
    assert trainer.agent.iteration == 2
    assert trainer.stats.total_steps == 2 * 8 * 3

    trial = Trial(str(tmp_path), None)
    assert trial.iteration == 2
    ckpt = trial.load_checkpoint()
    assert ckpt["iteration"] == 2
    assert "agent" in ckpt


def test_trainer_scan_driver_jax_env(tmp_path):
    env = DummyJaxEnvironment(observation_dim=6, action_dim=2, num_instances=4)
    trainer = Trainer(
        environment=env,
        agent_factory=make_factory(normalize_observation=True),
        num_iterations=3,
        verbose=False,
    )
    trainer.run_training_loop()
    assert trainer.agent.iteration == 3
    # Observation RMS must have accumulated from inside the fused scan.
    obs_norm = trainer.agent.hook["observation_normalization"]
    assert float(obs_norm.observation_rms.count) > 0


def test_trainer_resume(tmp_path):
    env = DummyEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    trainer = Trainer(
        environment=env,
        agent_factory=make_factory(),
        num_iterations=2,
        logger_factory=LoggerFactory(log_dir=str(tmp_path)),
        experiment_name="resume_test",
        verbose=False,
    )
    trainer.run_training_loop()

    trial = Trial(str(tmp_path))
    env2 = DummyEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    trainer2 = Trainer(
        environment=env2,
        agent_factory=make_factory(),
        num_iterations=3,
        checkpoint=trial.load_checkpoint(),
        verbose=False,
    )
    assert trainer2.agent.iteration == 2
    trainer2.run_training_loop()
    assert trainer2.agent.iteration == 3


def test_player_on_host_env():
    env = DummyEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    player = Player(
        environment=env,
        agent_factory=make_factory(),
        deterministic=True,
        num_steps=20,
        verbose=False,
    )
    summary = player.run_playing_loop()
    assert "step_reward" in summary
    assert player.agent.inference_mode


def test_player_on_jax_env():
    env = DummyJaxEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    player = Player(environment=env, agent_factory=make_factory(), num_steps=10, verbose=False)
    summary = player.run_playing_loop()
    assert np.isfinite(summary["step_reward"])


def test_scan_and_host_drivers_share_buffer_schema():
    """The scan rollout must produce the same transition fields as the host path."""
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    env_h = DummyEnvironment(observation_dim=6, action_dim=2, num_instances=3, seed=1)
    t_h = Trainer(environment=env_h, agent_factory=make_factory(), num_iterations=1, verbose=False)
    t_h.run_training_loop()
    env_j = DummyJaxEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    agent_j = make_factory()(env_j.spec)
    transitions, _ = ScanRolloutDriver(agent_j, env_j).collect(agent_j.num_steps_per_update)
    assert set(t_h.agent.buffer.schema) == set(transitions)


def test_checkpoint_file_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt_1.npz")
    from cusrl_tpu.template.logger import save_checkpoint_file

    ckpt = {"agent": {"a.b": np.ones((2, 2)), "c": np.zeros(3)}, "iteration": 7, "stats": {"total_steps": 5}}
    save_checkpoint_file(path, ckpt)
    loaded = load_checkpoint_file(path)
    assert loaded["iteration"] == 7
    np.testing.assert_array_equal(loaded["agent"]["a.b"], np.ones((2, 2)))
    assert loaded["stats"]["total_steps"] == 5


def test_trainer_scan_driver_recurrent(tmp_path):
    env = DummyJaxEnvironment(observation_dim=6, action_dim=2, num_instances=4)
    factory = cusrl_tpu.RecurrentPpoAgentFactory(
        num_steps_per_update=8, rnn_hidden_size=16, mlp_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=2, normalize_observation=True,
    )
    trainer = Trainer(environment=env, agent_factory=factory, num_iterations=2, verbose=False)
    trainer.run_training_loop()
    assert trainer.agent.iteration == 2


def test_player_recurrent_agent():
    env = DummyEnvironment(observation_dim=6, action_dim=2, num_instances=3)
    factory = cusrl_tpu.RecurrentPpoAgentFactory(
        num_steps_per_update=8, rnn_hidden_size=16, mlp_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1,
    )
    player = Player(environment=env, agent_factory=factory, num_steps=12, verbose=False)
    summary = player.run_playing_loop()
    assert np.isfinite(summary["step_reward"])


def test_tensorboard_logger_backend(tmp_path):
    from cusrl_tpu.template.logger import make_logger_factory

    factory = make_logger_factory("tensorboard", log_dir=str(tmp_path))
    logger = factory("tb_test")
    logger.log_scalars({"Train/loss": 1.0}, 0)
    logger.log_scalars({"Train/loss": 2.0}, 1)
    logger.close()
    import glob

    events = glob.glob(str(tmp_path / "*" / "events.out.tfevents.*"))
    assert events, "tensorboard event file not written"
