"""Symmetry suite tests (counterpart of cusrl_test/hook/auxiliary/test_symmetry*).

Mirror permutations are generated randomly but valid (self-inverse), matching
the reference's test-side mirror construction (cusrl_test/_helpers.py:18-61).
"""

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.hook import (
    MirrorDef,
    MirrorSymmetryLoss,
    SymmetricArchitecture,
    SymmetricDataAugmentation,
    TransitionMirroring,
)
from tests.helpers import create_dummy_env, run_training


def self_inverse_mirror(dim: int, seed: int) -> MirrorDef:
    rng = np.random.default_rng(seed)
    perm = np.arange(dim)
    # Random involution: swap random disjoint pairs.
    indices = rng.permutation(dim)
    for a, b in zip(indices[0::2], indices[1::2]):
        perm[a], perm[b] = perm[b], perm[a]
    flipped = [int(i) for i in rng.choice(dim, size=dim // 3, replace=False)]
    # Keep flips consistent with the involution: flip both elements of a pair.
    flip_set = set(flipped) | {int(perm[i]) for i in flipped}
    return MirrorDef(perm.tolist(), sorted(flip_set))


def mirrored_env(seed=0, **kwargs):
    obs_dim, act_dim = 8, 3
    env = create_dummy_env(observation_dim=obs_dim, action_dim=act_dim, **kwargs)
    env.spec.mirror_observation = self_inverse_mirror(obs_dim, seed)
    env.spec.mirror_action = self_inverse_mirror(act_dim, seed + 1)
    if env.spec.state_dim:
        env.spec.mirror_state = self_inverse_mirror(env.spec.state_dim, seed + 2)
    return env


def test_mirror_def_is_self_inverse():
    mirror = self_inverse_mirror(10, 0)
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 10)), jnp.float32)
    np.testing.assert_allclose(np.asarray(mirror(mirror(x))), np.asarray(x), atol=1e-6)


def make_factory(hooks_to_add=(), **kwargs):
    defaults = dict(num_steps_per_update=8, actor_hidden_dims=(32,), critic_hidden_dims=(32,),
                    sampler_epochs=2, sampler_mini_batches=2)
    defaults.update(kwargs)
    factory = cusrl_tpu.PpoAgentFactory(**defaults).to_underlying()
    for hook, position in hooks_to_add:
        factory.register_hook(hook, **position)
    return factory


def test_transition_mirroring():
    env = mirrored_env()
    factory = make_factory([(TransitionMirroring(), {"index": 0})])
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["surrogate_loss"])


def test_mirror_symmetry_loss():
    env = mirrored_env(with_state=True)
    factory = make_factory([(MirrorSymmetryLoss(weight=0.5), {"after": "on_policy_preparation"})])
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["action_mean_symmetry_loss"])


def test_symmetric_data_augmentation():
    env = mirrored_env()
    factory = make_factory([(SymmetricDataAugmentation(), {"before": "on_policy_preparation"})])
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["surrogate_loss"])


def test_symmetric_architecture_policy_is_symmetric():
    env = mirrored_env()
    factory = make_factory([(SymmetricArchitecture(), {"index": 0})])
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)

    # A strictly symmetric policy: act_det(mirror(obs)) == mirror(act_det(obs)).
    import jax
    import jax.numpy as jnp

    obs = jnp.asarray(np.random.default_rng(3).standard_normal((5, 8)), jnp.float32)
    actor = agent.state.actor
    action, _ = actor.act_deterministic(obs)
    m_obs = env.spec.mirror_observation(obs)
    m_action, _ = actor.act_deterministic(m_obs)
    np.testing.assert_allclose(
        np.asarray(env.spec.mirror_action(m_action)), np.asarray(action), atol=1e-4
    )
