"""Real-TPU validation + throughput of the micro-T fused attention kernel.

1. Compiled-Mosaic equality vs the XLA reference at training shapes
   (N=4096, H=4, T=24, W=16, D=32), forward and gradients.
2. Transformer PPO full-iteration throughput with sequence_mode auto->micro.
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


def timeit(fn, *args, warmup=2, iters=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / iters, compile_s


def main():
    from cusrl_tpu.nn.kernels.micro_attention import micro_reference, micro_window_attention

    emit(devices=[str(d) for d in jax.devices()])
    N, H, T, W, D = 4096, 4, 24, 16, 32
    S = W + T
    keys = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(keys[0], (N, H, T, D), jnp.float32)
    k = jax.random.normal(keys[1], (N, H, S, D), jnp.float32)
    v = jax.random.normal(keys[2], (N, H, S, D), jnp.float32)
    done = jax.random.bernoulli(keys[3], 0.05, (N, T))
    q_seg = jnp.cumsum(jnp.pad(done.astype(jnp.int32), ((0, 0), (1, 0)))[:, :-1], axis=1)
    k_seg = jnp.concatenate([jnp.zeros((N, W), jnp.int32), q_seg], axis=1)
    k_valid = jnp.concatenate(
        [jax.random.bernoulli(keys[4], 0.7, (N, W)).astype(jnp.int32), jnp.ones((N, T), jnp.int32)], axis=1
    )

    try:
        pal = jax.jit(lambda *a: micro_window_attention(*a, window=W, use_pallas=True))(
            q, k, v, q_seg, k_seg, k_valid
        )
        ref = jax.jit(lambda *a: micro_reference(*a, W, None))(q, k, v, q_seg, k_seg, k_valid)
        err = float(jnp.max(jnp.abs(pal - ref)))
        emit(probe="micro_fwd_max_abs_err", value=err, ok=bool(err < 2e-3))

        def loss(fn):
            return lambda q_, k_, v_: jnp.sum(jnp.sin(fn(q_, k_, v_)))

        g_ref = jax.jit(jax.grad(loss(lambda *a: micro_reference(*a, q_seg, k_seg, k_valid, W, None)),
                                 argnums=(0, 1, 2)))(q, k, v)
        g_pal = jax.jit(jax.grad(loss(lambda *a: micro_window_attention(
            *a, q_seg, k_seg, k_valid, window=W, use_pallas=True)), argnums=(0, 1, 2)))(q, k, v)
        gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_ref, g_pal))
        emit(probe="micro_grad_max_abs_err", value=gerr, ok=bool(gerr < 1e-2))

        # kernel vs XLA timing at the update minibatch shape (N=1024 cols).
        qc, kc, vc = q[:1024], k[:1024], v[:1024]
        qs, ks, kv = q_seg[:1024], k_seg[:1024], k_valid[:1024]
        f_pal = jax.jit(jax.grad(loss(lambda *a: micro_window_attention(
            *a, qs, ks, kv, window=W, use_pallas=True)), argnums=(0, 1, 2)))
        f_ref = jax.jit(jax.grad(loss(lambda *a: micro_reference(*a, qs, ks, kv, W, None)), argnums=(0, 1, 2)))
        ms, cs = timeit(lambda: f_ref(qc, kc, vc))
        emit(probe="xla_ref_fwd_bwd_ms", ms=round(ms, 3), compile_s=round(cs, 1))
        ms, cs = timeit(lambda: f_pal(qc, kc, vc))
        emit(probe="micro_kernel_fwd_bwd_ms", ms=round(ms, 3), compile_s=round(cs, 1))
    except Exception as e:  # noqa: BLE001
        emit(error=str(e)[:800])
        return

    # ---- full transformer iteration with auto->micro -----------------------
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    env = VelocityLocomotionEnv(num_instances=4096)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=24,
        embed_dim=128,
        num_heads=4,
        attention_window=16,
        mlp_hidden_dims=(128,),
        activation_fn="elu",
        sampler_epochs=5,
        sampler_mini_batches=4,
        normalize_observation=True,
        defer_normalization_updates=True,
        store_original_observations=False,
        desired_kl_divergence=0.01,
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)

    def full_iter():
        driver.collect_and_update(24)
        return driver._packed

    ms, cs = timeit(full_iter, warmup=2, iters=10)
    emit(probe="transformer_full_iteration_ms", ms=round(ms, 2), compile_s=round(cs, 1),
         env_steps_per_s=round(24 * 4096 / (ms / 1e3), 0))


if __name__ == "__main__":
    main()
