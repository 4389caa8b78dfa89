"""Native C environment: physics sanity vs gymnasium CartPole + PPO integration."""

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.native import NativeCartPoleEnv


def test_native_dynamics_match_gymnasium():
    gym = pytest.importorskip("gymnasium")
    env = NativeCartPoleEnv(num_instances=1, seed=3)
    obs, _, _ = env.reset()

    ref = gym.make("CartPole-v1").unwrapped
    ref.reset()
    ref.state = np.asarray(obs[0], np.float64)

    state = obs
    for step in range(30):
        action = step % 2
        onehot = np.eye(2, dtype=np.float32)[[action]]
        state, _, reward, terminated, truncated, _ = env.step(onehot)
        ref_obs, ref_reward, ref_term, ref_trunc, _ = ref.step(action)
        np.testing.assert_allclose(state[0], ref_obs, atol=1e-5)
        assert bool(terminated[0, 0]) == bool(ref_term)
        if terminated[0, 0]:
            break


def test_native_env_ppo_training():
    env = NativeCartPoleEnv(num_instances=8, seed=0)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=16, actor_hidden_dims=(32,), critic_hidden_dims=(32,),
        activation_fn="tanh", action_space_type="discrete",
        sampler_epochs=2, sampler_mini_batches=2,
    )
    trainer = cusrl_tpu.Trainer(environment=env, agent_factory=factory, num_iterations=2, verbose=False)
    trainer.run_training_loop()
    assert trainer.agent.iteration == 2
    assert trainer.stats.episode_count >= 0
