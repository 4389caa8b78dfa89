"""sparse_bootstrap must produce EXACTLY the same next_value as the full
next-state pass, including the overflow fallback (short episodes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.template.hook import find_hook


def make_state(seed=0):
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=10, action_dim=3, seed=1)
    agent = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=6, actor_hidden_dims=(16,), critic_hidden_dims=(16,)
    )(env.spec)
    return agent.state


def make_rollout(key, T=6, N=8, D=10, trunc_rate=0.1):
    keys = jax.random.split(key, 4)
    return {
        "observation": jax.random.normal(keys[0], (T, N, D), jnp.float32),
        "next_observation": jax.random.normal(keys[1], (T, N, D), jnp.float32),
        "terminated": jax.random.bernoulli(keys[2], 0.05, (T, N, 1)),
        "truncated": jax.random.bernoulli(keys[3], trunc_rate, (T, N, 1)),
    }


@pytest.mark.parametrize("trunc_rate", [0.0, 0.1, 0.9])  # 0.9 forces overflow
def test_sparse_equals_full(trunc_rate):
    state = make_state()
    _, hook = find_hook(state.hooks, "value_computation")
    rollout = make_rollout(jax.random.PRNGKey(1), trunc_rate=trunc_rate)

    _, full, _ = hook.replace(sparse_bootstrap=False).pre_update(state, dict(rollout))
    _, sparse, _ = hook.replace(sparse_bootstrap=True).pre_update(state, dict(rollout))
    np.testing.assert_array_equal(np.asarray(full["value"]), np.asarray(sparse["value"]))
    np.testing.assert_allclose(
        np.asarray(full["next_value"]), np.asarray(sparse["next_value"]), atol=1e-6
    )


def test_sparse_under_jit():
    state = make_state()
    _, hook = find_hook(state.hooks, "value_computation")
    rollout = make_rollout(jax.random.PRNGKey(2))

    @jax.jit
    def run(state, rollout):
        _, out, _ = hook.replace(sparse_bootstrap=True).pre_update(state, rollout)
        return out["next_value"]

    _, full, _ = hook.replace(sparse_bootstrap=False).pre_update(state, dict(rollout))
    np.testing.assert_allclose(
        np.asarray(run(state, dict(rollout))), np.asarray(full["next_value"]), atol=1e-6
    )
