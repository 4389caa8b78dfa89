"""Real-TPU validation + timing of the fused transformer-block kernels.

1. Correctness at bench shapes: fused-block layer route vs the modular XLA
   path on [T=24, N=1024, 48] (the temporal minibatch), outputs + gradients.
2. Speed: whole-layer fwd+bwd, fused route vs modular route.
3. Full transformer bench iteration (honors CUSRL_TPU_FUSED_TRANSFORMER — run the
   script twice, 0 then 1, to A/B; the persistent compilation cache makes the
   second process cheap).

Interpret-mode equivalents live in tests/test_fused_block.py; this script is
the Mosaic/real-TPU gate (ROADMAP rule: interpret mode hides v5e constraints).
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


def layer_probes():
    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory
    from cusrl_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    emit(devices=[str(d) for d in jax.devices()])

    t_len, batch, in_dim = 24, 1024, 48
    factory = CausalTransformerEncoderLayerFactory(
        embed_dim=128, num_heads=4, window=16, compute_dtype="bfloat16"
    )
    layer = factory(in_dim, None, jax.random.key(0))
    keys = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(keys[0], (t_len, batch, in_dim), jnp.float32)
    done = jax.random.uniform(keys[1], (t_len, batch, 1)) < 0.05
    tgt = jax.random.normal(keys[2], (t_len, batch, 128), jnp.float32)
    memory = layer.init_memory(batch)

    def run(layer_, fused: bool):
        os.environ["CUSRL_TPU_FUSED_TRANSFORMER"] = "1" if fused else "0"
        out, mem, _ = layer_(x, memory, sequential=True, done=done)
        return out, mem

    # -- correctness ---------------------------------------------------------
    out_ref, mem_ref = jax.jit(lambda l: run(l, False))(layer)
    out_fused, mem_fused = jax.jit(lambda l: run(l, True))(layer)
    err = float(jnp.max(jnp.abs(out_fused.astype(jnp.float32) - out_ref.astype(jnp.float32))))
    mem_err = max(
        float(jnp.max(jnp.abs(mem_fused[k].astype(jnp.float32) - mem_ref[k].astype(jnp.float32))))
        for k in ("k_cache", "v_cache", "cache_mask")
    )
    emit(probe="layer_forward_err", max_abs_err=err, memory_err=mem_err)

    def loss(layer_, fused):
        out, _ = run(layer_, fused)
        return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

    g_ref = jax.jit(jax.grad(lambda l: loss(l, False)))(layer)
    g_fused = jax.jit(jax.grad(lambda l: loss(l, True)))(layer)
    worst = 0.0
    worst_path = ""
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        rel = float(jnp.max(jnp.abs(b.astype(jnp.float32) - a.astype(jnp.float32)))) / scale
        if rel > worst:
            worst, worst_path = rel, jax.tree_util.keystr(path)
    emit(probe="layer_grad_err", worst_rel_err=worst, worst_leaf=worst_path)

    # -- speed: whole-layer fwd+bwd -----------------------------------------
    grad_ref = jax.jit(jax.grad(lambda l: loss(l, False)))
    grad_fused = jax.jit(jax.grad(lambda l: loss(l, True)))
    ms_ref, cs_ref = timeit(grad_ref, layer)
    ms_fused, cs_fused = timeit(grad_fused, layer)
    emit(probe="layer_fwd_bwd", modular_ms=round(ms_ref, 3), fused_ms=round(ms_fused, 3),
         compile_s=[round(cs_ref, 1), round(cs_fused, 1)])

    # Primal-only (the rollout/value-pass shape at full width).
    xw = jnp.concatenate([x, x, x, x], axis=1)
    dw = jnp.concatenate([done, done, done, done], axis=1)
    memw = layer.init_memory(4 * batch)

    def primal(layer_, fused):
        os.environ["CUSRL_TPU_FUSED_TRANSFORMER"] = "1" if fused else "0"
        out, _, _ = layer_(xw, memw, sequential=True, done=dw)
        return out

    ms_ref_p, _ = timeit(jax.jit(lambda l: primal(l, False)), layer)
    ms_fused_p, _ = timeit(jax.jit(lambda l: primal(l, True)), layer)
    emit(probe="layer_primal_4096", modular_ms=round(ms_ref_p, 3), fused_ms=round(ms_fused_p, 3))


def full_iteration():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    num_envs, T = 4096, 24
    env = VelocityLocomotionEnv(num_instances=num_envs)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=T,
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

    def full_iter(n=1):
        for _ in range(n):
            driver.collect_and_update(T)
        return driver._packed if driver._packed is not None else agent.state

    ms, cs = timeit(full_iter, warmup=3, iters=30)
    emit(
        probe="full_iteration",
        fused_block=os.environ.get("CUSRL_TPU_FUSED_TRANSFORMER", "1"),
        ms=round(ms, 2),
        steps_per_s=round(T * num_envs / ms * 1e3, 0),
        compile_s=round(cs, 1),
    )


if __name__ == "__main__":
    if os.environ.get("PROBE", "layer") == "layer":
        layer_probes()
    else:
        full_iteration()
