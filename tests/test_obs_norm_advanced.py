"""ObservationNormalization advanced paths: subset-of-state stat sharing,
mirror-aware statistics, renormalize, freeze, NaN cleaning (counterpart of
cusrl_test/hook/mdp/test_observation*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.hook import MirrorDef, ObservationNanToNum, ObservationNormalization
from tests.helpers import create_dummy_env, run_training


def make_factory(obs_hook, **kwargs):
    defaults = dict(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
                    sampler_epochs=1, sampler_mini_batches=1)
    defaults.update(kwargs)
    factory = cusrl_tpu.PpoAgentFactory(**defaults).to_underlying()
    factory.register_hook(obs_hook, index=1)
    return factory


def test_observation_subset_of_state_shares_stats():
    env = create_dummy_env(with_state=True, observation_dim=4)
    # Observation channels correspond to state channels [1, 2, 3, 0].
    env.spec.observation_is_subset_of_state = (1, 2, 3, 0)
    factory = make_factory(ObservationNormalization())
    agent = factory(env.spec)
    run_training(agent, env, num_updates=2)
    hook = agent.hook["observation_normalization"]
    np.testing.assert_allclose(
        np.asarray(hook.observation_rms.mean),
        np.asarray(hook.state_rms.mean)[[1, 2, 3, 0]],
        atol=1e-6,
    )
    assert float(hook.observation_rms.count) == float(hook.state_rms.count)


def test_mirror_aware_statistics_are_symmetric():
    env = create_dummy_env(observation_dim=4)
    # Mirror swaps channels (0,1) and (2,3): stats must be equal across pairs.
    env.spec.mirror_observation = MirrorDef([1, 0, 3, 2], [])
    factory = make_factory(ObservationNormalization())
    agent = factory(env.spec)
    run_training(agent, env, num_updates=2)
    mean = np.asarray(agent.hook["observation_normalization"].observation_rms.mean)
    var = np.asarray(agent.hook["observation_normalization"].observation_rms.var)
    assert mean[0] == pytest.approx(mean[1], abs=1e-5)
    assert mean[2] == pytest.approx(mean[3], abs=1e-5)
    assert var[0] == pytest.approx(var[1], abs=1e-5)


def test_renormalize_uses_fresh_stats():
    env = create_dummy_env()
    factory = make_factory(ObservationNormalization(renormalize=True))
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["surrogate_loss"])


def test_freeze_stops_updates():
    env = create_dummy_env()
    factory = make_factory(ObservationNormalization())
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)
    hook = agent.hook["observation_normalization"]
    count_before = float(hook.observation_rms.count)
    agent.update_hook(hook.hook_name, hook.freeze())
    run_training(agent, env, num_updates=1)
    assert float(agent.hook["observation_normalization"].observation_rms.count) == count_before


def test_nan_to_num_cleans_observations():
    hook = ObservationNanToNum(nan=0.5, posinf=1.0, neginf=-1.0)
    transition = {"observation": jnp.asarray([[jnp.nan, jnp.inf, -jnp.inf, 2.0]])}
    _, transition = hook.pre_act(None, transition)
    np.testing.assert_allclose(np.asarray(transition["observation"]), [[0.5, 1.0, -1.0, 2.0]])


def test_rnd_reward_math_with_fixed_nets():
    from cusrl_tpu.hook.on_policy import value  # noqa: F401  (import check)
    from cusrl_tpu.hook import RandomNetworkDistillation
    from cusrl_tpu.nn.module.stub import IdentityFactory

    env = create_dummy_env(observation_dim=4, action_dim=2)
    hook = RandomNetworkDistillation(module_factory=IdentityFactory(), output_dim=4, reward_scale=2.0)
    agent = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=4, actor_hidden_dims=(8,), critic_hidden_dims=(8,),
        sampler_epochs=1, sampler_mini_batches=1,
    ).to_underlying()
    agent.register_hook(hook, before="value_computation")
    built = agent(env.spec)
    rnd = built.hook["random_network_distillation"]
    # Identity target == identity predictor -> zero intrinsic reward.
    rollout = {
        "next_observation": jnp.ones((2, 3, 4)),
        "reward": jnp.zeros((2, 3, 1)),
    }
    _, rollout2, metrics = rnd.pre_update(built.state, rollout)
    np.testing.assert_allclose(np.asarray(rollout2["reward"]), 0.0, atol=1e-6)


def test_exponential_scheduler():
    from cusrl_tpu.utils.scheduler import ExponentialScheduler

    sched = ExponentialScheduler(1.0, 0.5, minimum=0.2)
    assert sched(0) == 1.0 and sched(1) == 0.5 and sched(10) == 0.2
