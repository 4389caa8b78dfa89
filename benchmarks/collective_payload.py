"""Measured per-iteration collective payload of the DP training step
(VERDICT r4 item 5c — the analytic basis for the >=85%-to-4-hosts claim).

Compiles the REAL fused update under an 8-device DP mesh (virtual CPU devices)
and a hierarchical (2 dcn x 4 ici) mesh, then walks the optimized HLO counting
every cross-device collective's payload bytes.  Prints one JSON line per mesh;
docs/SCALING.md quotes the result.

Run: JAX_PLATFORMS=cpu python benchmarks/collective_payload.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8, "pred": 1, "s8": 1, "u8": 1}

_SHAPE_RE = re.compile(r"(f32|bf16|f16|f64|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def _payload_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collect_hlo_collectives(hlo_text: str) -> dict:
    """Sums payload bytes per collective kind over the optimized HLO."""
    out: dict[str, dict] = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\([^)]*\)|\S+) (all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\(", line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        entry = out.setdefault(kind, {"count": 0, "bytes": 0})
        entry["count"] += 1
        entry["bytes"] += _payload_bytes(shape_str)
    return out


def main():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.parallel.sharding import distribute_agent, get_mesh, shard_batch

    # The bench config at a realistic env count: with tiny batches XLA
    # all-gathers the sharded data and computes redundantly instead of
    # reducing gradients (measured at 64 envs), so payload structure IS
    # env-count dependent — measure near the bench shape.
    num_envs, T = int(os.environ.get("PAYLOAD_ENVS", 1024)), 24
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
    )
    agent = factory(env.spec)
    n_params = sum(
        int(np.prod(np.shape(l)))
        for l in jax.tree.leaves((agent.state.actor, agent.state.critic))
        if hasattr(l, "shape")
    )

    rng = np.random.default_rng(0)
    obs_dim, act_dim = env.spec.observation_dim, env.spec.action_dim
    obs = jnp.asarray(rng.standard_normal((T, num_envs, obs_dim)), jnp.float32)
    done = jnp.asarray(rng.random((T, num_envs, 1)) < 0.05)
    dist, _, _ = agent.state.actor(obs)
    rollout = {
        "observation": obs,
        "next_observation": jnp.asarray(rng.standard_normal((T, num_envs, obs_dim)), jnp.float32),
        "action": jnp.asarray(rng.standard_normal((T, num_envs, act_dim)), jnp.float32),
        "action_dist": dist,
        "action_logp": agent.state.actor.compute_logp(
            dist, jnp.zeros((T, num_envs, act_dim), jnp.float32)
        ),
        "reward": jnp.asarray(rng.standard_normal((T, num_envs, 1)), jnp.float32),
        "terminated": done,
        "truncated": jnp.zeros_like(done),
        "done": done,
    }

    # The TPU kernel path (pallas + shard_map, engaged on real chips) psums
    # the backbone weight/bias grads explicitly once per minibatch step —
    # payload fixed by construction, independent of XLA's partitioning choice.
    backbone_params = sum(
        int(np.prod(np.shape(l)))
        for l in jax.tree.leaves((agent.state.actor.backbone, agent.state.critic.backbone))
        if hasattr(l, "shape")
    )
    steps = 5 * 4
    print(json.dumps({
        "mesh": "tpu-kernel-path (analytic, by construction)",
        "backbone_params": backbone_params,
        "psum_bytes_per_minibatch_step": backbone_params * 4,
        "minibatch_steps_per_update": steps,
        "total_psum_bytes_per_update": backbone_params * 4 * steps,
    }))

    for label, mesh in (
        ("dp8", get_mesh(1)),
        ("dcn2x4ici", get_mesh(1, dcn_parallel_size=2)),
    ):
        distribute_agent(agent, mesh)
        with jax.set_mesh(mesh):
            rollout_s = shard_batch(rollout, mesh, axis=1)
            lowered = jax.jit(agent.update_body).lower(
                agent.state, rollout_s, jax.random.key(0), None
            )
            hlo = lowered.compile().as_text()
        stats = collect_hlo_collectives(hlo)
        total = sum(v["bytes"] for v in stats.values())
        print(json.dumps({
            "mesh": label,
            "trainable_params": n_params,
            "collectives": stats,
            "total_payload_bytes_per_update": total,
            "note": "whole-update HLO: 20 minibatch steps (5 epochs x 4 minibatches)",
        }))


if __name__ == "__main__":
    main()
