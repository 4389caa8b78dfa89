"""Full PPO training loops on dummy envs (counterpart of
cusrl_test/integration/test_agent_ppo_basic.py + test_agent_state_dict.py)."""

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.hook.on_policy.advantage import AdvantageReduction
from tests.helpers import create_dummy_env, run_training


def make_agent(env, **kwargs):
    defaults = dict(
        num_steps_per_update=8,
        actor_hidden_dims=(32, 32),
        critic_hidden_dims=(32, 32),
        sampler_epochs=2,
        sampler_mini_batches=2,
    )
    defaults.update(kwargs)
    return cusrl_tpu.PpoAgentFactory(**defaults)(env.spec)


def test_ppo_basic_observation_only():
    env = create_dummy_env()
    agent = make_agent(env)
    metrics = run_training(agent, env, num_updates=2)
    assert agent.iteration == 2
    assert "surrogate_loss" in metrics and "value_loss" in metrics
    assert np.isfinite(list(metrics.values())).all()


def test_ppo_with_state_and_normalization():
    env = create_dummy_env(with_state=True)
    agent = make_agent(env, normalize_observation=True)
    run_training(agent, env, num_updates=2)
    obs_norm = agent.hook["observation_normalization"]
    assert float(obs_norm.observation_rms.count) > 0
    assert float(obs_norm.state_rms.count) > 0


def test_ppo_multi_reward_with_advantage_reduction():
    env = create_dummy_env(reward_dim=3)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(32,), critic_hidden_dims=(32,), sampler_epochs=1
    ).to_underlying()
    factory.register_hook(AdvantageReduction(), before="ppo_surrogate_loss")
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["surrogate_loss"])


def test_ppo_numpy_io_preserved():
    env = create_dummy_env()
    agent = make_agent(env)
    obs, state, _ = env.reset()
    action = agent.act(obs)
    assert isinstance(action, np.ndarray)
    assert action.shape == (env.num_instances, env.spec.action_dim)


def test_ppo_discrete_action_space():
    env = create_dummy_env(action_dim=4)
    agent = make_agent(env, action_space_type="discrete")
    obs, _, _ = env.reset()
    action = agent.act(obs)
    assert np.allclose(action.sum(-1), 1.0)  # one-hot
    run_training(agent, env, num_updates=1)


def test_ppo_kl_adaptive_lr_and_rejection():
    env = create_dummy_env()
    agent = make_agent(env, desired_kl_divergence=0.01, max_kl_divergence=0.5)
    metrics = run_training(agent, env, num_updates=3)
    assert "lr_scale" in metrics and "update_rejected" in metrics
    assert np.isfinite(metrics["kl_divergence"])


def test_state_dict_roundtrip():
    env = create_dummy_env()
    agent = make_agent(env)
    run_training(agent, env, num_updates=1)
    ckpt = agent.state_dict()

    agent2 = make_agent(env)
    agent2.load_state_dict(ckpt)
    w1 = np.asarray(agent.state.actor.backbone.layers[0].weight)
    w2 = np.asarray(agent2.state.actor.backbone.layers[0].weight)
    np.testing.assert_array_equal(w1, w2)
    assert agent2.iteration == agent.iteration


def test_state_dict_tolerant_loading():
    env = create_dummy_env()
    agent = make_agent(env)
    ckpt = agent.state_dict()
    # Missing entries -> warn and keep init; extra entries -> warn and ignore;
    # shape mismatches -> warn and skip.  None of these may raise.
    broken = dict(ckpt)
    state_entries = dict(ckpt["agent_state"])
    some_key = next(iter(state_entries))
    del state_entries[some_key]
    state_entries["nonexistent.key"] = np.zeros(3)
    other_key = next(k for k, v in state_entries.items() if getattr(v, "ndim", 0) >= 2)
    state_entries[other_key] = np.zeros((1, 1))
    broken["agent_state"] = state_entries
    agent.load_state_dict(broken)  # must not raise
    agent.load_state_dict({})  # missing agent_state entirely -> warn only


def test_inference_mode_deterministic():
    env = create_dummy_env()
    agent = make_agent(env)
    run_training(agent, env, num_updates=1)
    agent.set_inference_mode(deterministic=True)
    obs, _, _ = env.reset()
    a1 = agent.act(obs)
    a2 = agent.act(obs)
    np.testing.assert_allclose(a1, a2, atol=1e-6)
    # step in inference mode must not push to buffer
    before = agent.buffer.cursor
    obs2, _, reward, term, trunc, _ = env.step(a1)
    agent.step(obs2, reward, term, trunc)
    assert agent.buffer.cursor == before


def test_feedforward_module_consistency():
    from cusrl_tpu.nn.module.mlp import MlpFactory
    from tests.helpers import assert_module_consistency

    assert_module_consistency(MlpFactory(hidden_dims=(32, 32), activation="tanh"))
