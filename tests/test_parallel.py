"""Sharding tests on the virtual 8-device CPU mesh: DP training must be
numerically equivalent to single-device training; TP placement must execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.parallel.sharding import distribute_agent, get_mesh, replicate, shard_batch
from cusrl_tpu.template.rollout import ScanRolloutDriver


def make_agent(seed=0, **kwargs):
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0  # identical construction streams across calls
    env = VelocityLocomotionEnv(num_instances=32, observation_dim=16, action_dim=4, seed=1)
    defaults = dict(
        num_steps_per_update=8,
        actor_hidden_dims=(32, 32),
        critic_hidden_dims=(32, 32),
        sampler_epochs=2,
        sampler_mini_batches=2,
        normalize_observation=True,
    )
    defaults.update(kwargs)
    agent = cusrl_tpu.PpoAgentFactory(**defaults)(env.spec)
    return env, agent


def run_iters(env, agent, n=2):
    driver = ScanRolloutDriver(agent, env)
    for _ in range(n):
        driver.collect_and_update(agent.num_steps_per_update)
    jax.block_until_ready(agent.state)
    return np.asarray(agent.state.actor.backbone.layers[0].weight)


def test_dp_training_matches_single_device():
    env1, agent1 = make_agent()
    w_single = run_iters(env1, agent1)

    env2, agent2 = make_agent()
    distribute_agent(agent2, get_mesh(1))
    w_sharded = run_iters(env2, agent2)

    np.testing.assert_allclose(w_single, w_sharded, atol=2e-5)


def test_tensor_parallel_executes():
    env, agent = make_agent()
    mesh = get_mesh(model_parallel_size=2)
    distribute_agent(agent, mesh, tensor_parallel=True)
    with jax.set_mesh(mesh):
        w = run_iters(env, agent, n=1)
    assert np.isfinite(w).all()


def test_tp_training_matches_single_device():
    """TP must be numerically equivalent to single-device training — the
    alternating row/column partition only changes WHERE the matmuls run, not
    what they compute (XLA inserts the psum at the sharding boundary)."""
    env1, agent1 = make_agent()
    w_single = run_iters(env1, agent1)

    env2, agent2 = make_agent()
    mesh = get_mesh(model_parallel_size=8)  # pure TP: 1 x 8
    distribute_agent(agent2, mesh, tensor_parallel=True)
    with jax.set_mesh(mesh):
        w_tp = run_iters(env2, agent2)

    np.testing.assert_allclose(w_single, w_tp, atol=5e-5)


def test_tp_dp_combined_matches_single_device():
    """The full 4x2 (data x model) mesh must also reproduce single-device
    numerics end-to-end through the fused collect_and_update path."""
    env1, agent1 = make_agent()
    w_single = run_iters(env1, agent1)

    env2, agent2 = make_agent()
    mesh = get_mesh(model_parallel_size=2)
    distribute_agent(agent2, mesh, tensor_parallel=True)
    with jax.set_mesh(mesh):
        w_both = run_iters(env2, agent2)

    np.testing.assert_allclose(w_single, w_both, atol=5e-5)


def test_shard_batch_and_replicate_placement():
    mesh = get_mesh(1)
    x = jnp.zeros((16, 4))
    sharded = shard_batch(x, mesh)
    assert len(sharded.sharding.device_set) == 8
    replicated = replicate(x, mesh)
    assert replicated.sharding.is_fully_replicated
