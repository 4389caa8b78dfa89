"""Multi-iteration fused dispatch (ScanRolloutDriver.collect_and_update_many).

One jitted call covers K full training iterations; per-iteration aggregates and
metrics come back stacked.  The fallback (schedules firing inside the chunk)
must be bit-identical to driving collect_and_update by hand.
"""

import jax
import numpy as np

import cusrl_tpu
from cusrl_tpu.template.rollout import ScanRolloutDriver
from cusrl_tpu.template.trainer import Trainer
from cusrl_tpu.testing import DummyJaxEnvironment


def make_factory(**kwargs):
    defaults = dict(
        num_steps_per_update=6,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
        sampler_epochs=2,
        sampler_mini_batches=2,
        normalize_observation=True,
        desired_kl_divergence=0.01,
    )
    defaults.update(kwargs)
    return cusrl_tpu.PpoAgentFactory(**defaults)


def _make(seed=0, **kwargs):
    # Pin the global key sequence so repeated constructions are identical.
    from cusrl_tpu.utils import misc

    cusrl_tpu.set_global_seed(seed)
    misc._KEY_COUNTER[0] = 0
    env = DummyJaxEnvironment(observation_dim=5, action_dim=3, num_instances=4)
    agent = make_factory(**kwargs)(env.spec)
    return agent, env, ScanRolloutDriver(agent, env)


def test_many_shapes_iteration_and_sync():
    agent, env, driver = _make()
    aggs, stacked, keys = driver.collect_and_update_many(6, 3)
    assert aggs.shape == (3, 3)
    assert stacked.shape == (3, len(keys))
    assert agent.iteration == 3
    assert np.all(np.isfinite(np.asarray(stacked)))
    # Lazy state sync after the chunk: device iteration matches host count.
    assert int(agent.state.iteration) == 3
    # A further single-iteration call composes with the chunked program.
    aggs1, stacked1, keys1 = driver.collect_and_update(6)
    assert keys1 == keys and stacked1.shape == (len(keys),)


def test_many_fallback_is_bit_identical_to_manual_loop():
    # warmup_iterations>0 makes the LR schedule fire each early iteration, so
    # collect_and_update_many must take the per-iteration fallback path.
    agent_a, _, driver_a = _make(seed=3)
    agent_b, _, driver_b = _make(seed=3)
    for agent in (agent_a, agent_b):
        sched = agent.get_hook("adaptive_l_r_schedule")
        agent.update_hook("adaptive_l_r_schedule", sched.replace(warmup_iterations=4))

    driver_a.collect_and_update_many(6, 3)

    for _ in range(3):
        driver_b.collect_and_update(6)
        agent_b.iteration += 1
        agent_b._apply_schedules(agent_b.iteration)

    assert agent_a.iteration == agent_b.iteration == 3
    pa = jax.tree.leaves(agent_a.state.actor)
    pb = jax.tree.leaves(agent_b.state.actor)
    for a, b in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_iterations_per_dispatch():
    env = DummyJaxEnvironment(observation_dim=5, action_dim=3, num_instances=4)
    trainer = Trainer(
        environment=env,
        agent_factory=make_factory(),
        num_iterations=5,
        checkpoint_interval=2,
        verbose=False,
        iterations_per_dispatch=3,
    )
    trainer.run_training_loop()
    assert trainer.agent.iteration == 5
    assert trainer.stats.total_steps == 5 * 6 * 4


def test_trainer_chunked_matches_unchunked_stats():
    def run(ipd):
        env = DummyJaxEnvironment(observation_dim=5, action_dim=3, num_instances=4)
        trainer = Trainer(
            environment=env,
            agent_factory=make_factory(),
            num_iterations=4,
            checkpoint_interval=100,
            verbose=False,
            iterations_per_dispatch=ipd,
        )
        trainer.run_training_loop()
        return trainer

    t1, t3 = run(1), run(3)
    assert t1.stats.total_steps == t3.stats.total_steps
    assert t1.agent.iteration == t3.agent.iteration == 4
