"""CLI + zoo tests (counterpart of cusrl_test/cli/*)."""

import os

import numpy as np
import pytest

from cusrl_tpu.utils.cli_utils import apply_overrides, parse_value, split_cli_overrides


def test_parse_value():
    assert parse_value("1e-4") == pytest.approx(1e-4)
    assert parse_value("true") is True and parse_value("None") is None
    assert parse_value("(64, 64)") == (64, 64)
    assert parse_value("adam") == "adam"


def test_split_overrides():
    own, over = split_cli_overrides(["a", "b", "--", "--x.y", "1"])
    assert own == ["a", "b"] and over == ["--x.y", "1"]


def test_apply_overrides_nested():
    from cusrl_tpu.preset.ppo import PpoAgentFactory

    factory = PpoAgentFactory()
    new, applied = apply_overrides(factory, ["--lr", "1e-4", "--actor_hidden_dims", "(32, 32)"])
    assert new.lr == pytest.approx(1e-4)
    assert new.actor_hidden_dims == (32, 32)
    assert factory.lr != 1e-4  # original untouched
    assert applied == {"lr": "1e-4", "actor_hidden_dims": "(32, 32)"}


def test_apply_overrides_through_training_factory():
    from cusrl_tpu.zoo.registry import get_experiment

    spec = get_experiment("CartPole-v1", "ppo")
    factory = spec.to_training_factory()
    new, _ = apply_overrides(factory, ["--agent.lr", "5e-4", "--environment_kwargs.num_envs", "4"])
    assert new.agent.lr == pytest.approx(5e-4)
    assert new.environment_kwargs["num_envs"] == 4


def test_registry_contains_reference_suites():
    from cusrl_tpu.zoo.registry import list_experiments

    names = list_experiments()
    for expected in ("CartPole-v1_ppo", "MountainCar-v0_ppo", "Pendulum-v1_ppo", "Velocity-Flat_ppo"):
        assert expected in names
    # Full reference zoo coverage (SURVEY.md §2.8): isaaclab velocity (13
    # robots) + classic (3) + humanoid AMP (3), mjlab velocity (4) + tracking
    # (2), robot_lab (5) — registration/listing works without the simulators.
    assert sum(n.startswith("Isaac-Velocity-") for n in names) == 13
    assert sum(n.startswith("Isaac-Humanoid-AMP-") for n in names) == 3
    assert {"Isaac-Ant-v0_ppo", "Isaac-Cartpole-v0_ppo", "Isaac-Humanoid-v0_ppo"} <= set(names)
    assert sum(n.startswith("Mjlab-Velocity-") for n in names) == 4
    assert sum(n.startswith("Mjlab-Tracking-") for n in names) == 2
    assert sum(n.startswith("RobotLab-") for n in names) == 5
    assert "Velocity-Flat_amp" in names


def test_locomotion_demonstration_dataset_tracks_commands():
    import jax.numpy as jnp

    from cusrl_tpu.environment.locomotion import demonstration_dataset

    data = demonstration_dataset(num_transitions=512, num_instances=16)
    assert data.shape == (512, 32)
    assert bool(jnp.all(jnp.isfinite(data)))
    # The scripted expert produces non-degenerate, varying transitions.
    assert float(jnp.std(data)) > 1e-3


def test_native_amp_experiment_builds_agent():
    from cusrl_tpu.zoo.registry import get_experiment

    spec = get_experiment("Velocity-Flat", "amp")
    factory = spec.to_training_factory()
    factory.environment_kwargs = {"num_instances": 8}
    factory.agent.num_steps_per_update = 4
    factory.agent.actor_hidden_dims = (16,)
    factory.agent.critic_hidden_dims = (16,)
    factory.agent.amp_discriminator_hidden_dims = (16,)
    factory.agent.sampler_epochs = 1
    factory.agent.sampler_mini_batches = 1
    import functools

    from cusrl_tpu.environment.locomotion import demonstration_dataset

    factory.agent.amp_dataset_source = functools.partial(
        demonstration_dataset, num_transitions=256, num_instances=8
    )
    factory.num_iterations = 1
    trainer = factory(logger_factory=None, verbose=False)
    trainer.run_training_loop()


def test_cli_train_and_resume_roundtrip(tmp_path, monkeypatch):
    from cusrl_tpu.__main__ import main

    monkeypatch.chdir(tmp_path)
    main([
        "train", "-env", "CartPole-v1", "-alg", "ppo",
        "--num-iterations", "2", "--logger", "none", "--seed", "0",
        "--log-dir", str(tmp_path / "logs"), "--quiet",
        "--", "--agent.sampler_epochs", "1", "--num_iterations", "2",
    ])
    # A run dir with a checkpoint must exist and find-trial must resolve it.
    from cusrl_tpu.template.trial import Trial

    trial = Trial(str(tmp_path / "logs"))
    assert trial.iteration == 2
    main([
        "find-trial", "--log-dir", str(tmp_path / "logs"), "--what", "iteration",
    ])


def test_cli_benchmark(tmp_path, monkeypatch, capsys):
    from cusrl_tpu.__main__ import main

    monkeypatch.chdir(tmp_path)
    main([
        "benchmark", "-env", "CartPole-v1", "-alg", "ppo", "--num-steps", "12",
        "--log-dir", str(tmp_path / "logs"),
    ])
    captured = capsys.readouterr()
    assert "step_reward" in captured.out


def test_cli_export(tmp_path, monkeypatch):
    from cusrl_tpu.__main__ import main

    main([
        "export", "-env", "CartPole-v1", "-alg", "ppo",
        "-o", str(tmp_path / "exported"), "--format", "package",
        "--log-dir", str(tmp_path / "logs"),
    ])
    assert (tmp_path / "exported" / "policy.pkl").exists()
    assert (tmp_path / "exported" / "manifest.yaml").exists()


def test_cli_inherit_args_replays_recorded_overrides(tmp_path, monkeypatch):
    from cusrl_tpu.__main__ import main
    from cusrl_tpu.cli.common import resolve_overrides
    from cusrl_tpu.template.trial import Trial
    from cusrl_tpu.zoo.registry import get_experiment

    monkeypatch.chdir(tmp_path)
    main([
        "train", "-env", "CartPole-v1", "-alg", "ppo",
        "--num-iterations", "1", "--logger", "none", "--seed", "0",
        "--log-dir", str(tmp_path / "logs"), "--quiet",
        "--", "--agent.lr", "7e-4", "--agent.sampler_epochs", "1",
    ])
    trial = Trial(str(tmp_path / "logs"))
    assert trial.load_metadata()["overrides"]["agent.lr"] == "7e-4"

    factory = get_experiment("CartPole-v1", "ppo").to_playing_factory()
    replayed, applied = resolve_overrides(factory, [], trial, inherit=True)
    assert replayed.agent.lr == pytest.approx(7e-4)
    assert applied["agent.lr"] == "7e-4"
