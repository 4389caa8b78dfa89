"""Per-epoch varying minibatch counts (reference parity:
cusrl/sampler/mini_batch_sampler.py:12-92 accepts a sequence with one count per
epoch).  XLA needs static batch shapes, so segments of equal counts compile
separate scan bodies — the training result must still cover every epoch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.sampler.mini_batch_sampler import MiniBatchSampler, TemporalMiniBatchSampler
from cusrl_tpu.template.rollout import ScanRolloutDriver


def test_epoch_segments():
    assert MiniBatchSampler(3, 4).epoch_segments() == [(0, 3, 4)]
    s = MiniBatchSampler(5, (8, 4, 4, 2, 2))
    assert s.epoch_segments() == [(0, 1, 8), (1, 2, 4), (3, 2, 2)]


def test_sequence_validation():
    with pytest.raises(ValueError, match="one value per"):
        MiniBatchSampler(3, (4, 2))
    with pytest.raises(ValueError, match="positive"):
        MiniBatchSampler(2, (4, 0))


def test_varying_plan_covers_every_epoch():
    s = MiniBatchSampler(4, (2, 2, 4, 4), shuffle_block_size=1)
    plans = s.make_plan(jax.random.key(0), 4, 8, {})
    assert isinstance(plans, list) and len(plans) == 2
    meta0, arrays0, idx0 = plans[0]
    meta1, arrays1, idx1 = plans[1]
    assert meta0["total_mini_batches"] == 2 and idx0.shape == (4, 16)
    assert meta1["total_mini_batches"] == 4 and idx1.shape == (8, 8)
    np.testing.assert_array_equal(np.asarray(arrays0["epoch_index"]), [0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(arrays1["epoch_index"]), [2, 2, 2, 2, 3, 3, 3, 3])
    # Each epoch's indices form a permutation of the full sample range.
    for idx, count in ((idx0, 2), (idx1, 4)):
        per_epoch = np.asarray(idx).reshape(-1, count * idx.shape[1])
        for row in per_epoch:
            assert sorted(row.tolist()) == list(range(32))


def test_varying_epoch_plan_segments():
    s = MiniBatchSampler(3, (2, 4, 4), shuffle_block_size=1)
    plans = s.make_epoch_plan(jax.random.key(1), 4, 8, {})
    assert isinstance(plans, list) and len(plans) == 2
    (m0, p0, b0), (m1, p1, b1) = plans
    assert (m0["epoch_start"], m0["segment_epochs"], b0) == (0, 1, 16)
    assert (m1["epoch_start"], m1["segment_epochs"], b1) == (1, 2, 8)
    assert p0.shape == (1, 32) and p1.shape == (2, 32)


def make_agent(sampler, seed=0):
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=16, observation_dim=12, action_dim=3, seed=1)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
    ).to_underlying()
    factory.sampler = sampler
    return env, factory(env.spec)


def test_full_agent_update_with_varying_counts():
    env, agent = make_agent(MiniBatchSampler(num_epochs=3, num_mini_batches=(4, 2, 2)))
    driver = ScanRolloutDriver(agent, env)
    for _ in range(2):
        driver.collect_and_update(agent.num_steps_per_update)
    w = np.asarray(agent.state.actor.backbone.layers[0].weight)
    assert np.isfinite(w).all()


def test_full_agent_update_with_varying_counts_temporal():
    env, agent = make_agent(TemporalMiniBatchSampler(num_epochs=2, num_mini_batches=(4, 2)))
    driver = ScanRolloutDriver(agent, env)
    driver.collect_and_update(agent.num_steps_per_update)
    w = np.asarray(agent.state.actor.backbone.layers[0].weight)
    assert np.isfinite(w).all()


def test_constant_counts_unchanged_single_plan():
    s = MiniBatchSampler(3, 4)
    plan = s.make_plan(jax.random.key(2), 4, 8, {})
    assert isinstance(plan, tuple)
    plan2 = s.make_epoch_plan(jax.random.key(2), 4, 8, {})
    assert plan2 is None or isinstance(plan2, tuple)
