"""Real-TPU validation + throughput for the attention training path
(VERDICT round-1 item 3).

1. On-device equality: ``banded_window_attention(use_pallas=True)`` vs the
   masked XLA reference at realistic training shapes.
2. Throughput of a full TransformerPpoAgentFactory training iteration
   (rolling-cache attention backbone, temporal sampler) on the fused scan
   driver — recorded in benchmarks/ATTENTION_TPU.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from cusrl_tpu.nn.kernels.banded_attention import _banded_reference, banded_window_attention

    emit(devices=[str(d) for d in jax.devices()])

    # -- 1. kernel equality at training shapes -------------------------------
    N, H, T, W, D = 512, 4, 64, 16, 32
    keys = jax.random.split(jax.random.key(0), 5)
    S = W + T
    q = jax.random.normal(keys[0], (N, H, T, D), jnp.float32)
    k = jax.random.normal(keys[1], (N, H, S, D), jnp.float32)
    v = jax.random.normal(keys[2], (N, H, S, D), jnp.float32)
    done = jax.random.bernoulli(keys[3], 0.05, (N, T))
    q_seg = jnp.cumsum(jnp.pad(done.astype(jnp.int32), ((0, 0), (1, 0)))[:, :-1], axis=1)
    k_seg = jnp.concatenate([jnp.zeros((N, W), jnp.int32), q_seg], axis=1)
    k_valid = jnp.concatenate(
        [jax.random.bernoulli(keys[4], 0.7, (N, W)).astype(jnp.int32), jnp.ones((N, T), jnp.int32)], axis=1
    )

    ref = jax.jit(lambda *a: _banded_reference(*a, W, None, 128))(q, k, v, q_seg, k_seg, k_valid)
    pal = jax.jit(
        lambda *a: banded_window_attention(*a, window=W, use_pallas=True)
    )(q, k, v, q_seg, k_seg, k_valid)
    err = float(jnp.max(jnp.abs(pal - ref)))
    emit(probe="banded_pallas_vs_reference_max_abs_err", value=err, shapes=f"N{N} H{H} T{T} W{W} D{D}")
    assert err < 2e-2, err

    # grad check on-device
    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(jnp.sin(fn(q_, k_, v_)))

    g_ref = jax.jit(jax.grad(loss(lambda *a: _banded_reference(*a, q_seg, k_seg, k_valid, W, None, 128)),
                              argnums=(0, 1, 2)))(q, k, v)
    g_pal = jax.jit(jax.grad(loss(lambda *a: banded_window_attention(*a, q_seg, k_seg, k_valid, window=W,
                                                                      use_pallas=True)), argnums=(0, 1, 2)))(q, k, v)
    gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_ref, g_pal))
    emit(probe="banded_pallas_grad_max_abs_err", value=gerr)
    assert gerr < 5e-2, gerr

    # -- 2. transformer PPO training throughput -------------------------------
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    num_envs, steps = 4096, 24
    env = VelocityLocomotionEnv(num_instances=num_envs)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=steps,
        embed_dim=128,
        num_heads=4,
        attention_window=16,
        mlp_hidden_dims=(128,),
        sampler_epochs=5,
        sampler_mini_batches=4,
        normalize_observation=True,
        defer_normalization_updates=True,
        store_original_observations=False,
        desired_kl_divergence=0.01,
        fuse_actor_critic_evaluation=os.environ.get("ATTN_FUSE_EVAL", "0") == "1",
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)

    def one_iter():
        driver.collect_and_update(steps)
        agent.iteration += 1

    t0 = time.perf_counter()
    one_iter()
    jax.block_until_ready(driver._packed if driver._packed is not None else agent.state)
    emit(probe="transformer_bench_compile_s", value=round(time.perf_counter() - t0, 1))
    for _ in range(3):
        one_iter()
    jax.block_until_ready(driver._packed if driver._packed is not None else agent.state)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    jax.block_until_ready(driver._packed if driver._packed is not None else agent.state)
    per = (time.perf_counter() - t0) / iters
    emit(
        probe="transformer_ppo_env_steps_per_s",
        ms_per_iter=round(per * 1e3, 2),
        env_steps_per_s=round(num_envs * steps / per),
    )


if __name__ == "__main__":
    main()
