"""Shared test harnesses (counterpart of cusrl_test/_helpers.py:18-96)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import cusrl_tpu
from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook
from cusrl_tpu.testing import DummyEnvironment


def create_dummy_env(
    with_state: bool = False,
    reward_dim: int = 1,
    num_instances: int = 4,
    observation_dim: int = 8,
    action_dim: int = 3,
    seed: int = 0,
    **kwargs,
) -> DummyEnvironment:
    return DummyEnvironment(
        observation_dim=observation_dim,
        action_dim=action_dim,
        num_instances=num_instances,
        state_dim=observation_dim + 2 if with_state else None,
        reward_dim=reward_dim,
        seed=seed,
        **kwargs,
    )


def run_training(agent, env, num_updates: int = 2):
    """Mini trainer loop without the Trainer class."""
    observation, state, _ = env.reset()
    updates = 0
    metrics = {}
    while updates < num_updates:
        action = agent.act(observation, state)
        observation, state, reward, terminated, truncated, _ = env.step(action)
        if agent.step(observation, reward, terminated, truncated, next_state=state):
            metrics = agent.update()
            updates += 1
    return metrics


class ConsistencyHook(Hook):
    """Asserts sequence/batch-mode policy re-evaluation reproduces rollout-time
    distributions (the key recurrent-correctness invariant; cusrl_test/_helpers.py:79-96).

    Use with a 1-epoch/1-minibatch sampler so the recorded metric is exact.
    """

    training_only: bool = static_field(default=True, kw_only=True)

    def objective(self, state, metadata, batch):
        diff = jax.tree.map(
            lambda a, b: jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))),
            batch["action_dist"],
            batch["curr_action_dist"],
        )
        max_diff = jnp.max(jnp.stack(jax.tree.leaves(diff)))
        return self, batch, None, {"consistency_max_diff": max_diff}


def assert_module_consistency(
    backbone_factory, atol: float = 1e-4, with_state: bool = False, steps: int = 16, observation_dim: int = 8
):
    """Builds a PPO agent around the given backbone and checks rollout-vs-batch
    consistency after one update."""
    from cusrl_tpu.nn.module.actor import ActorFactory
    from cusrl_tpu.nn.module.critic import ValueFactory
    from cusrl_tpu.nn.module.distribution import NormalDistFactory
    from cusrl_tpu.preset.optimizer import AdamFactory
    from cusrl_tpu.preset.ppo import ppo_hook_suite
    from cusrl_tpu.sampler import AutoMiniBatchSampler
    from cusrl_tpu.template.actor_critic import ActorCriticFactory

    env = create_dummy_env(with_state=with_state, observation_dim=observation_dim)
    hooks = ppo_hook_suite()
    # Insert the consistency probe right after on_policy_preparation.
    factory = ActorCriticFactory(
        num_steps_per_update=steps,
        actor_factory=ActorFactory(backbone_factory=backbone_factory, distribution_factory=NormalDistFactory()),
        critic_factory=ValueFactory(backbone_factory=backbone_factory),
        optimizer_factory=AdamFactory(lr=1e-3),
        sampler=AutoMiniBatchSampler(num_epochs=1, num_mini_batches=1),
        hooks=hooks,
    )
    factory.register_hook(ConsistencyHook(), after="on_policy_preparation")
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=1)
    assert metrics["consistency_max_diff"] < atol, metrics["consistency_max_diff"]
    return agent


def numpy_gae_reference(reward, done, value, next_value, gamma, lamda):
    """Independent NumPy reference for the GAE recurrence (for golden parity)."""
    reward = np.asarray(reward, np.float32)
    done = np.asarray(done, bool)
    value = np.asarray(value, np.float32)
    next_value = np.asarray(next_value, np.float32)
    advantage = reward + gamma * next_value - value
    for t in range(advantage.shape[0] - 2, -1, -1):
        advantage[t] += (~done[t]) * gamma * lamda * advantage[t + 1]
    return advantage
