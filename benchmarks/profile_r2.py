"""Round-2 TPU profiling campaign: where do the 31 ms/iteration go?

Runs ON the real TPU (axon). Prints one JSON line per measurement.
Programs are compiled sequentially in one process (tunnel compiles are
expensive); never kill this mid-run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.template.rollout import ScanRolloutDriver

NUM_ENVS = 4096
STEPS = 24
ROWS = NUM_ENVS * STEPS // 4  # one minibatch: 24576 rows


def emit(name, ms, **extra):
    print(json.dumps({"probe": name, "ms": round(ms, 3), **extra}), flush=True)


def timeit(fn, *args, warmup=2, iters=20):
    """Throughput-style timing: queue ``iters`` calls, block once.  A blocking
    call over the axon tunnel pays a ~25 ms RPC round trip, so per-call
    blocking measures latency, not device time."""
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
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    env = VelocityLocomotionEnv(num_instances=NUM_ENVS)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=STEPS,
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

    # P1: full fused iteration (bench steady state) --------------------------
    def one_iter():
        out = driver.collect_and_update(STEPS)
        return out[0]

    t0 = time.perf_counter()
    jax.block_until_ready(one_iter())
    emit("fused_iteration_compile", (time.perf_counter() - t0) * 1e3)
    for _ in range(3):
        one_iter()
    jax.block_until_ready(driver._packed)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    jax.block_until_ready(driver._packed)
    per = (time.perf_counter() - t0) / iters
    emit("fused_iteration", per * 1e3, env_steps_per_s=round(NUM_ENVS * STEPS / per))

    # P2: rollout-only and update-only ---------------------------------------
    driver2 = ScanRolloutDriver(agent, env, packed=False)
    transitions, _ = driver2.collect(STEPS)  # compiles _rollout_jit
    jax.block_until_ready(transitions)

    state = agent.state

    # rollout program alone (non-donated copy for repeat timing)
    carry_args = (
        state,
        driver2._env_state,
        driver2._observation,
        driver2._obs_state,
        agent.actor_memory,
        (driver2._cum_reward, driver2._cum_length),
        agent.next_key(),
    )
    rollout_nodonate = jax.jit(driver2._rollout, static_argnames=("num_steps",))

    def run_rollout():
        carry, transitions_, agg = rollout_nodonate(*carry_args, num_steps=STEPS)
        return agg

    ms, comp = timeit(run_rollout)
    emit("rollout_only", ms, compile_s=round(comp, 1))

    # update program alone
    upd = jax.jit(agent.update_body)
    key = agent.next_key()

    def run_update():
        st, metrics = upd(state, transitions, key)
        return metrics["surrogate_loss"] if "surrogate_loss" in metrics else list(metrics.values())[0]

    ms, comp = timeit(run_update, warmup=2, iters=8)
    emit("update_only", ms, compile_s=round(comp, 1))

    # P3: raw stacked MLP pair fwd+bwd, scan-20, minibatch rows ---------------
    obs_dim, act_dim = env.spec.observation_dim, env.spec.action_dim
    dims = [obs_dim, 512, 256, 128]
    k = jax.random.key(0)
    ws, bs = [], []
    for i in range(len(dims) - 1):
        k, k1 = jax.random.split(k)
        ws.append(jax.random.normal(k1, (2, dims[i], dims[i + 1]), jnp.float32) * 0.05)
        bs.append(jnp.zeros((2, 1, dims[i + 1]), jnp.float32))
    head_w = jax.random.normal(k, (2, 128, act_dim), jnp.float32) * 0.05
    x = jax.random.normal(k, (2, ROWS, obs_dim), jnp.float32)
    tgt = jax.random.normal(k, (2, ROWS, act_dim), jnp.float32)

    def mlp_pair(params, x):
        ws_, bs_, head = params
        h = x.astype(jnp.bfloat16)
        for w, b in zip(ws_, bs_):
            h = jnp.einsum("sbi,sio->sbo", h, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            h = jax.nn.elu(h + b).astype(jnp.bfloat16)
        out = jnp.einsum("sbi,sio->sbo", h, head.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        return out

    def make_scan20(net):
        def loss(params):
            out = net(params, x)
            return jnp.mean(jnp.square(out - tgt))

        def step(params, _):
            l, g = jax.value_and_grad(loss)(params)
            params = jax.tree.map(lambda p, gr: p - 1e-3 * gr, params, g)
            return params, l

        @jax.jit
        def scan20(params):
            params, ls = jax.lax.scan(step, params, jnp.arange(20))
            return ls

        return scan20

    params = (ws, bs, head_w)
    ms, comp = timeit(make_scan20(mlp_pair), params, warmup=1, iters=6)
    emit("raw_mlp_pair_scan20", ms, per_step=round(ms / 20, 3), compile_s=round(comp, 1))

    ms, comp = timeit(make_scan20(jax.checkpoint(mlp_pair)), params, warmup=1, iters=6)
    emit("raw_mlp_pair_scan20_remat", ms, per_step=round(ms / 20, 3), compile_s=round(comp, 1))

    # P4: env-only scan-24 ----------------------------------------------------
    env_state0 = env.init_fn(jax.random.key(1))
    action0 = jnp.zeros((NUM_ENVS, act_dim), jnp.float32)

    @jax.jit
    def env_scan(env_state):
        def body(carry, key_t):
            es = carry
            es, reward, term, trunc, _ = env.step_fn(es, action0, key_t)
            obs, _ = env.observe_fn(es)
            return es, (reward.sum(), obs.sum())

        keys = jax.random.split(jax.random.key(2), STEPS)
        es, outs = jax.lax.scan(body, env_state, keys)
        return outs

    ms, comp = timeit(env_scan, env_state0, warmup=2, iters=10)
    emit("env_only_scan24", ms, compile_s=round(comp, 1))

    # P5: rng-only scan-24 (threefry share of the rollout) --------------------
    @jax.jit
    def rng_scan(key):
        def body(carry, _):
            key = carry
            key, k1, k2 = jax.random.split(key, 3)
            eps = jax.random.normal(k1, (NUM_ENVS, act_dim), jnp.float32)
            u = jax.random.uniform(k2, (NUM_ENVS, 2), jnp.float32)
            return key, (eps.sum() + u.sum())

        key, outs = jax.lax.scan(body, key, jnp.arange(STEPS))
        return outs

    ms, comp = timeit(rng_scan, jax.random.key(3), warmup=2, iters=10)
    emit("rng_only_scan24", ms, compile_s=round(comp, 1))

    # P6: adam/metrics overhead probe — scan-20 of param-tree adam updates ----
    flat_params = {f"p{i}": w for i, w in enumerate(jax.tree.leaves(params))}
    import optax

    tx = optax.scale_by_adam()
    opt_state0 = tx.init(flat_params)

    @jax.jit
    def adam_scan(params_, opt_state):
        def step(carry, _):
            p, s = carry
            g = jax.tree.map(lambda x: x * 1e-4, p)
            updates, s = tx.update(g, s, p)
            p = jax.tree.map(lambda x, u: x - 1e-3 * u, p, updates)
            return (p, s), jax.tree.leaves(p)[0].sum()

        (p, s), outs = jax.lax.scan(step, (params_, opt_state), jnp.arange(20))
        return outs

    ms, comp = timeit(adam_scan, flat_params, opt_state0, warmup=2, iters=10)
    emit("adam_tree_scan20", ms, per_step=round(ms / 20, 3), compile_s=round(comp, 1))

    # P7: cost analysis of the fused iteration --------------------------------
    try:
        lowered = driver._fused_packed.lower(driver._packed, agent.next_key())
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        emit(
            "fused_cost_analysis",
            0.0,
            flops=float(ca.get("flops", -1)),
            hbm_bytes=float(ca.get("bytes accessed", -1)),
        )
    except Exception as e:  # noqa: BLE001
        emit("fused_cost_analysis_failed", 0.0, error=str(e)[:200])


if __name__ == "__main__":
    main()
