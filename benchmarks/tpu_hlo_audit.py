"""Compile the bench update program and audit the optimized HLO: how many
Pallas custom calls actually execute per minibatch step?  (The train_step's
grad-probe objective is assumed DCE'd — custom calls must be side-effect-free
for XLA to drop them; this verifies it.)"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv

    num_envs, T = 4096, 24
    env = VelocityLocomotionEnv(num_instances=num_envs)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=T,
        actor_hidden_dims=(512, 256, 128),
        critic_hidden_dims=(512, 256, 128),
        activation_fn="elu",
        sampler_epochs=5,
        sampler_mini_batches=4,
        normalize_observation=True,
        defer_normalization_updates=True,
        store_original_observations=False,
        desired_kl_divergence=0.01,
        fuse_actor_critic_evaluation=True,
    )
    agent = factory(env.spec)
    state = agent.state
    obs_dim, act_dim = env.spec.observation_dim, env.spec.action_dim
    keys = jax.random.split(jax.random.key(0), 8)
    obs = jax.random.normal(keys[0], (T, num_envs, obs_dim), jnp.float32)
    done = jax.random.bernoulli(keys[4], 0.02, (T, num_envs, 1))
    action = jax.random.normal(keys[2], (T, num_envs, act_dim), jnp.float32)
    dist, _, _ = state.actor(obs.reshape(T * num_envs, obs_dim))
    dist = jax.tree.map(lambda x: x.reshape(T, num_envs, -1), dist)
    rollout = {
        "observation": obs,
        "next_observation": jax.random.normal(keys[1], (T, num_envs, obs_dim), jnp.float32),
        "action": action,
        "action_dist": dist,
        "action_logp": state.actor.compute_logp(dist, action),
        "reward": jax.random.normal(keys[3], (T, num_envs, 1), jnp.float32),
        "terminated": done,
        "truncated": jnp.zeros_like(done),
        "done": done,
    }
    lowered = jax.jit(agent.update_body).lower(state, rollout, jax.random.key(1), None)
    compiled = lowered.compile()
    text = compiled.as_text()
    calls = re.findall(r'custom_call_target="([^"]+)"', text)
    from collections import Counter

    counts = Counter(calls)
    print(json.dumps({"custom_call_targets": dict(counts)}))
    # Custom calls inside while/scan bodies (the 20-step minibatch loop).
    body_calls = 0
    in_body = False
    for line in text.splitlines():
        if re.search(r"(%fused_computation|%while_body|%body)", line):
            in_body = True
        if "tpu_custom_call" in line:
            body_calls += 1
    print(json.dumps({"total_tpu_custom_calls": body_calls}))
    # Rough cost model check: count fusions too.
    print(json.dumps({"num_fusion_ops": text.count(" fusion(")}))


if __name__ == "__main__":
    main()
