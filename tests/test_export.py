"""Export subsystem tests (counterpart of cusrl_test/integration/test_agent_export.py)."""

import os

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.export import InferencePolicy, load_exported_policy
from tests.helpers import create_dummy_env, run_training


def make_agent(env, recurrent=False, **kwargs):
    if recurrent:
        factory = cusrl_tpu.RecurrentPpoAgentFactory(
            num_steps_per_update=8, rnn_hidden_size=16, mlp_hidden_dims=(16,),
            sampler_epochs=1, sampler_mini_batches=1, **kwargs)
    else:
        factory = cusrl_tpu.PpoAgentFactory(
            num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
            sampler_epochs=1, sampler_mini_batches=1, **kwargs)
    return factory(env.spec)


def test_export_stablehlo_plain(tmp_path):
    env = create_dummy_env()
    agent = make_agent(env)
    agent.export(str(tmp_path), target_format="stablehlo")
    assert (tmp_path / "graph.stablehlo").exists()
    assert (tmp_path / "manifest.yaml").exists()
    import yaml

    manifest = yaml.safe_load((tmp_path / "manifest.yaml").read_text())
    assert manifest["inputs"]["observation"]["shape"] == [1, env.spec.observation_dim]
    assert manifest["outputs"]["action"]["shape"] == [1, env.spec.action_dim]


def test_export_stablehlo_recurrent_with_norm(tmp_path):
    env = create_dummy_env()
    agent = make_agent(env, recurrent=True, normalize_observation=True)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="stablehlo")
    import yaml

    manifest = yaml.safe_load((tmp_path / "manifest.yaml").read_text())
    assert manifest["is_recurrent"] is True


def test_export_package_roundtrip(tmp_path):
    env = create_dummy_env()
    agent = make_agent(env)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="package", verbose=False)
    actor = load_exported_policy(str(tmp_path))

    import jax.numpy as jnp

    obs = jnp.asarray(np.random.default_rng(0).standard_normal((3, env.spec.observation_dim)), jnp.float32)
    a1, _ = agent.state.actor.act_deterministic(obs)
    a2, _ = actor.act_deterministic(obs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_inference_policy_wrapper():
    env = create_dummy_env()
    agent = make_agent(env, recurrent=True)
    policy = InferencePolicy(agent.state.actor, num_instances=2)
    obs = np.zeros((2, env.spec.observation_dim), np.float32)
    action = policy(obs)
    assert isinstance(action, np.ndarray) and action.shape == (2, env.spec.action_dim)
    policy.reset([0])
    single = policy(np.zeros(env.spec.observation_dim, np.float32))
    assert single.shape[-1] == env.spec.action_dim


def test_export_with_prediction_heads(tmp_path):
    from cusrl_tpu.hook import ReturnPrediction

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1).to_underlying()
    factory.register_hook(ReturnPrediction(), after="on_policy_preparation")
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)
    agent.export(str(tmp_path), target_format="stablehlo", verbose=False)
    import yaml

    manifest = yaml.safe_load((tmp_path / "manifest.yaml").read_text())
    assert "return_prediction" in manifest["outputs"]
