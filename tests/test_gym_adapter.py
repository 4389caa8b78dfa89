"""Gym adapter tests: the host-loop driver trained end-to-end through
GymVectorEnvAdapter / GymEnvAdapter (counterpart of the reference's gym-based
quick-start path, cusrl/environment/gym.py:17-183 + README.md:53-55)."""

import numpy as np
import pytest

import cusrl_tpu

gym = pytest.importorskip("gymnasium")

from cusrl_tpu.environment.gym import make_gym_env, make_gym_vec  # noqa: E402


def test_vector_adapter_spec_and_partial_reset():
    env = make_gym_vec("CartPole-v1", num_envs=4)
    assert env.spec.observation_dim == 4
    assert env.spec.action_dim == 2  # discrete -> one-hot dim
    assert env.num_instances == 4
    obs, state, _ = env.reset()
    assert obs.shape == (4, 4) and obs.dtype == np.float32 and state is None
    action = np.tile(np.array([[1.0, 0.0]], np.float32), (4, 1))
    stepped = 0
    while True:
        obs, _, reward, term, trunc, _ = env.step(action)
        stepped += 1
        done = (term | trunc).reshape(-1)
        if done.any():
            # Partial reset must only touch done instances.
            before = obs.copy()
            obs2, _, _ = env.reset(np.nonzero(done)[0])
            np.testing.assert_array_equal(obs2[~done], before[~done])
            assert not np.array_equal(obs2[done], before[done])
            break
        assert stepped < 600
    env.close()


def test_single_env_adapter_discrete_argmax():
    env = make_gym_env("CartPole-v1")
    assert env.num_instances == 1
    obs, _, _ = env.reset()
    one_hot = np.array([[0.0, 1.0]], np.float32)
    obs, _, reward, term, trunc, _ = env.step(one_hot)
    assert obs.shape == (1, 4) and reward.shape == (1, 1)
    env.close()


def test_training_through_gym_vector_adapter():
    """A few updates of the MountainCar zoo config must run through the full
    host-loop driver (act -> vec env step -> partial resets -> update) and
    produce finite, improving-or-stable losses."""
    from cusrl_tpu.template.logger import LoggerFactory
    from cusrl_tpu.template.trainer import Trainer
    from cusrl_tpu.utils.misc import set_global_seed
    from cusrl_tpu.zoo.registry import get_experiment

    set_global_seed(7)
    spec = get_experiment("MountainCar-v0", "ppo")
    factory = spec.to_training_factory()
    factory.num_iterations = 6
    trainer = factory(verbose=False)
    trainer.run_training_loop()
    # The trainer ran 6 iterations x 16 steps x 16 envs through the adapter.
    assert trainer.agent.iteration >= 6
    trainer.environment.close()


def test_gym_env_continuous_roundtrip():
    env = make_gym_vec("Pendulum-v1", num_envs=2)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1, normalize_observation=True)
    agent = factory(env.spec)
    obs, _, _ = env.reset()
    for _ in range(10):
        action = agent.act(obs)
        obs, _, reward, term, trunc, _ = env.step(np.asarray(action))
        agent.step(obs, reward, term, trunc)
        done = (term | trunc).reshape(-1)
        if done.any():
            env.reset(np.nonzero(done)[0])
    assert np.isfinite(np.asarray(action)).all()
    env.close()
