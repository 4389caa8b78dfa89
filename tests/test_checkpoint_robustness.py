"""Checkpoint-robustness matrix (counterpart of
cusrl_test/integration/test_agent_state_dict.py:34-80): missing / extra /
shape-mismatched / empty state-dict entries must warn-and-continue, never
crash, and the agent must still act and train afterwards."""

import warnings

import numpy as np
import pytest

import cusrl_tpu
from tests.helpers import create_dummy_env, run_training


@pytest.fixture()
def agent_env():
    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1, normalize_observation=True)
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)
    return agent, env


def _still_trains(agent, env):
    run_training(agent, env, num_updates=1)
    obs, _, _ = env.reset()
    assert np.isfinite(np.asarray(agent.act(obs))).all()


def test_roundtrip_identity(agent_env):
    agent, env = agent_env
    sd = agent.state_dict()
    w_before = np.asarray(agent.state.actor.backbone.layers[0].weight)
    agent.load_state_dict(sd)
    np.testing.assert_array_equal(w_before, np.asarray(agent.state.actor.backbone.layers[0].weight))
    _still_trains(agent, env)


def test_load_empty_state_dict(agent_env):
    agent, env = agent_env
    agent.load_state_dict({})
    _still_trains(agent, env)


def test_load_with_extra_keys(agent_env):
    agent, env = agent_env
    sd = agent.state_dict()
    sd["__unused1"] = None
    sd["agent_state"]["totally.bogus.path"] = np.zeros(3, np.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        agent.load_state_dict(sd)
    assert any("bogus" in str(w.message) or "Unused" in str(w.message) for w in caught)
    _still_trains(agent, env)


def test_load_with_missing_entries(agent_env):
    agent, env = agent_env
    sd = agent.state_dict()
    removed = [p for p in sd["agent_state"] if p.startswith("actor.")]
    for p in removed:
        sd["agent_state"].pop(p)
    w_before = np.asarray(agent.state.actor.backbone.layers[0].weight)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        agent.load_state_dict(sd)
    assert caught  # warned about missing entries
    # Missing entries keep the current initialization.
    np.testing.assert_array_equal(w_before, np.asarray(agent.state.actor.backbone.layers[0].weight))
    _still_trains(agent, env)


def test_load_with_shape_mismatch(agent_env):
    agent, env = agent_env
    sd = agent.state_dict()
    path = next(p for p in sd["agent_state"] if p.endswith("layers.0.weight") and p.startswith("actor"))
    sd["agent_state"][path] = np.zeros((1,), np.float32)
    w_before = np.asarray(agent.state.actor.backbone.layers[0].weight)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        agent.load_state_dict(sd)
    assert any("mismatch" in str(w.message).lower() for w in caught)
    np.testing.assert_array_equal(w_before, np.asarray(agent.state.actor.backbone.layers[0].weight))
    _still_trains(agent, env)


def test_load_with_missing_hook_statefuls(agent_env):
    agent, env = agent_env
    sd = agent.state_dict()
    hook_paths = [p for p in sd["agent_state"] if p.startswith("hooks.")]
    assert hook_paths, "expected hook statefuls in the state dict"
    for p in hook_paths:
        sd["agent_state"].pop(p)
    agent.load_state_dict(sd)
    _still_trains(agent, env)


def test_load_mismatched_hook_parameter(agent_env):
    agent, env = agent_env
    sd = agent.state_dict()
    path = next(p for p in sd["agent_state"] if p.startswith("hooks."))
    sd["agent_state"][path] = np.zeros((7, 7), np.float32)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        agent.load_state_dict(sd)
    _still_trains(agent, env)
