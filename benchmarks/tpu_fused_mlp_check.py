"""Real-TPU validation + timing of the fused MLP kernel at bench shapes.

1. Correctness: fused kernel vs XLA reference on [24576, 48->512->256->128],
   forward and parameter gradients.
2. Speed: scan-20 SGD steps, fused kernel vs plain XLA chain (two networks).
3. Full bench iteration with the kernel engaged.
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


def timeit(fn, *args, warmup=2, iters=20):
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
    from cusrl_tpu.nn.kernels.fused_mlp import _reference, fused_mlp

    emit(devices=[str(d) for d in jax.devices()])
    B, dims = 24576, (48, 512, 256, 128)
    key = jax.random.key(0)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32) / np.sqrt(dims[i]))
        bs.append(jnp.zeros((1, dims[i + 1]), jnp.float32))
    ws, bs = tuple(ws), tuple(bs)
    x = jax.random.normal(key, (B, dims[0]), jnp.float32)
    tgt = jax.random.normal(key, (B, dims[-1]), jnp.float32)

    # -- correctness ---------------------------------------------------------
    ref = jax.jit(lambda x_: _reference(x_, ws, bs, "elu", True))(x)
    got = jax.jit(lambda x_: fused_mlp(x_, ws, bs, "elu", True, use_pallas=True))(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    emit(probe="fwd_max_abs_err", value=err)

    def loss(fn):
        def f(params, x_):
            out = fn(x_, params[0], params[1])
            return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

        return f

    loss_ref = loss(lambda x_, w_, b_: _reference(x_, w_, b_, "elu", True))
    loss_fused = loss(lambda x_, w_, b_: fused_mlp(x_, w_, b_, "elu", True, use_pallas=True))
    g_ref = jax.jit(jax.grad(loss_ref))((ws, bs), x)
    g_fused = jax.jit(jax.grad(loss_fused))((ws, bs), x)
    rel = [
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused))
    ]
    emit(probe="grad_max_rel_err", value=max(rel))

    # -- speed: scan-20 two-network SGD --------------------------------------
    def make_scan20(fn):
        def step(params, _):
            def two_net_loss(p):
                (wa, ba), (wc, bc) = p
                la = fn(x, wa, ba)
                lc = fn(x, wc, bc)
                return jnp.mean(jnp.square(la.astype(jnp.float32) - tgt)) + jnp.mean(
                    jnp.square(lc.astype(jnp.float32) - tgt)
                )

            l, g = jax.value_and_grad(two_net_loss)(params)
            params = jax.tree.map(lambda p_, g_: p_ - 1e-3 * g_, params, g)
            return params, l

        @jax.jit
        def scan20(params):
            params, ls = jax.lax.scan(step, params, jnp.arange(20))
            return ls

        return scan20

    params2 = ((ws, bs), (ws, bs))
    ms, comp = timeit(make_scan20(lambda x_, w_, b_: _reference(x_, w_, b_, "elu", True)), params2, iters=10)
    emit(probe="xla_two_net_scan20", ms=round(ms, 3), per_step=round(ms / 20, 4), compile_s=round(comp, 1))
    ms, comp = timeit(make_scan20(lambda x_, w_, b_: fused_mlp(x_, w_, b_, "elu", True, use_pallas=True)), params2, iters=10)
    emit(probe="fused_two_net_scan20", ms=round(ms, 3), per_step=round(ms / 20, 4), compile_s=round(comp, 1))

    # -- full bench iteration with kernel engaged -----------------------------
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    env = VelocityLocomotionEnv(num_instances=4096)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=24,
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
    driver = ScanRolloutDriver(agent, env)

    def one_iter():
        driver.collect_and_update(24)
        agent.iteration += 1

    t0 = time.perf_counter()
    one_iter()
    jax.block_until_ready(driver._packed)
    emit(probe="bench_compile_s", value=round(time.perf_counter() - t0, 1))
    for _ in range(3):
        one_iter()
    jax.block_until_ready(driver._packed)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    jax.block_until_ready(driver._packed)
    per = (time.perf_counter() - t0) / iters
    emit(probe="bench_iteration", ms=round(per * 1e3, 3), env_steps_per_s=round(4096 * 24 / per))


if __name__ == "__main__":
    main()
