"""Decompose the transformer PPO iteration cost (185 ms/iter in round 2):
full fused iteration vs update-only vs objective-only vs temporal gather.

Shapes: 4096 envs x 24 steps, embed 128, 4 heads, window 16, MLP (128,) tail,
5 epochs x 4 temporal minibatches (1024 columns each).
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
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    emit(devices=[str(d) for d in jax.devices()])
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

    # -- A. full fused iteration ---------------------------------------------
    def full_iter(n=1):
        for _ in range(n):
            driver.collect_and_update(T)
        return driver._packed if driver._packed is not None else agent.state

    ms, cs = timeit(full_iter, warmup=2, iters=10)
    emit(probe="full_iteration", ms=round(ms, 2), compile_s=round(cs, 1))

    # -- B. update-only on a synthetic rollout --------------------------------
    state = agent.state
    obs_dim, act_dim = env.spec.observation_dim, env.spec.action_dim
    keys = jax.random.split(jax.random.key(0), 8)
    obs = jax.random.normal(keys[0], (T, num_envs, obs_dim), jnp.float32)
    nxt = jax.random.normal(keys[1], (T, num_envs, obs_dim), jnp.float32)
    action = jax.random.normal(keys[2], (T, num_envs, act_dim), jnp.float32)
    reward = jax.random.normal(keys[3], (T, num_envs, 1), jnp.float32)
    done = jax.random.bernoulli(keys[4], 0.02, (T, num_envs, 1))
    memory0 = state.actor.init_memory(num_envs)
    memory_stack = jax.tree.map(lambda m: jnp.broadcast_to(m[None], (T,) + m.shape), memory0)
    cmem0 = state.critic.init_memory(num_envs)
    cmem_stack = None if cmem0 is None else jax.tree.map(
        lambda m: jnp.broadcast_to(m[None], (T,) + m.shape), cmem0
    )
    dist, _, _ = state.actor(obs.reshape(T * num_envs, obs_dim))
    dist = jax.tree.map(lambda x: x.reshape(T, num_envs, -1), dist)
    rollout = {
        "observation": obs,
        "next_observation": nxt,
        "action": action,
        "action_dist": dist,
        "action_logp": state.actor.compute_logp(dist, action),
        "reward": reward,
        "terminated": done,
        "truncated": jnp.zeros_like(done),
        "done": done,
        "actor_memory": memory_stack,
    }
    if cmem_stack is not None:
        # Recurrent critic: value recorded during rollout + memory stacks.
        flat_v, _, _ = state.critic(obs.reshape(T * num_envs, obs_dim), jax.tree.map(
            lambda m: jnp.broadcast_to(m[None], (T,) + m.shape).reshape((T * num_envs,) + m.shape[1:]), cmem0))
        rollout["value"] = flat_v.reshape(T, num_envs, -1)
        rollout["critic_memory"] = cmem_stack
        rollout["next_critic_memory"] = cmem_stack
    update_jit = jax.jit(agent.update_body)
    ms, cs = timeit(lambda: update_jit(state, rollout, jax.random.key(1), None), warmup=2, iters=10)
    emit(probe="update_only", ms=round(ms, 2), compile_s=round(cs, 1))

    # -- C. objective fwd+bwd for ONE temporal minibatch x 20 -----------------
    from cusrl_tpu.nn.base import combine, partition
    from cusrl_tpu.template.actor_critic import params_view, state_with_view
    from cusrl_tpu.template.hook import HookComposite

    cols = num_envs // 4
    batch = jax.tree.map(lambda x: x[:, :cols] if hasattr(x, "ndim") and x.ndim >= 2 else x, rollout)
    batch = dict(batch)
    batch["advantage"] = jax.random.normal(keys[5], (T, cols, 1), jnp.float32)
    if "value" not in batch and cmem_stack is not None:
        batch["value"] = jax.random.normal(keys[7], (T, cols, 1), jnp.float32)
    batch["return"] = jax.random.normal(keys[6], (T, cols, 1), jnp.float32)
    batch["value"] = jax.random.normal(keys[7], (T, cols, 1), jnp.float32)
    metadata = {
        "temporal": True,
        "epoch_index": 0,
        "mini_batch_index": 0,
        "total_epochs": 5,
        "total_mini_batches": 4,
    }
    composite = HookComposite()

    def one_obj(st):
        params, rest = partition(params_view(st))

        def loss_fn(p):
            s = state_with_view(st, combine(p, rest))
            _, _, objectives, _ = composite.objective(s, metadata, dict(batch))
            return sum(jnp.asarray(v, jnp.float32) for v in objectives.values())

        return jax.grad(loss_fn)(params)

    def twenty(st):
        def body(carry, _):
            g = one_obj(st)
            return carry, jax.tree.leaves(g)[0][0, 0]

        return jax.lax.scan(body, 0.0, None, length=20)

    f = jax.jit(twenty)
    ms, cs = timeit(lambda: f(state), warmup=2, iters=5)
    emit(probe="objective_x20", ms=round(ms, 2), compile_s=round(cs, 1))

    # -- D. temporal gather x 20 ----------------------------------------------
    perm = jax.random.permutation(jax.random.key(3), num_envs)

    def gathers(rollout):
        def body(carry, i):
            idx = jax.lax.dynamic_slice_in_dim(perm, 0, cols, 0)
            b = jax.tree.map(lambda x: x[:, idx] if hasattr(x, "ndim") and x.ndim >= 2 else x, rollout)
            return carry + jax.tree.leaves(b)[0][0, 0, 0], None

        return jax.lax.scan(body, 0.0, jnp.arange(20))[0]

    g = jax.jit(gathers)
    ms, cs = timeit(lambda: g(rollout), warmup=2, iters=10)
    emit(probe="temporal_gather_x20", ms=round(ms, 2), compile_s=round(cs, 1))




def bisect():
    """Partition update_body exactly: pre_update fold | minibatch scan | post_update fold."""
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.hook import HookComposite

    emit(devices=[str(d) for d in jax.devices()])
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
    state = agent.state
    obs_dim, act_dim = env.spec.observation_dim, env.spec.action_dim
    keys = jax.random.split(jax.random.key(0), 8)
    obs = jax.random.normal(keys[0], (T, num_envs, obs_dim), jnp.float32)
    action = jax.random.normal(keys[2], (T, num_envs, act_dim), jnp.float32)
    done = jax.random.bernoulli(keys[4], 0.02, (T, num_envs, 1))
    memory0 = state.actor.init_memory(num_envs)
    memory_stack = jax.tree.map(lambda m: jnp.broadcast_to(m[None], (T,) + m.shape), memory0)
    cmem0 = state.critic.init_memory(num_envs)
    cmem_stack = jax.tree.map(lambda m: jnp.broadcast_to(m[None], (T,) + m.shape), cmem0)
    dist, _, _ = state.actor(obs.reshape(T * num_envs, obs_dim))
    dist = jax.tree.map(lambda x: x.reshape(T, num_envs, -1), dist)
    flat_v, _, _ = state.critic(obs.reshape(T * num_envs, obs_dim), jax.tree.map(
        lambda m: jnp.broadcast_to(m[None], (T,) + m.shape).reshape((T * num_envs,) + m.shape[1:]), cmem0))
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
        "actor_memory": memory_stack,
        "value": flat_v.reshape(T, num_envs, -1),
        "critic_memory": cmem_stack,
        "next_critic_memory": cmem_stack,
    }
    composite = HookComposite()

    def pre_only(state, rollout):
        state, rollout, m = composite.pre_update(state, rollout)
        return jax.tree.leaves(rollout["next_value"])[0][0, 0], state.iteration

    f = jax.jit(pre_only)
    ms, cs = timeit(lambda: f(state, rollout), warmup=2, iters=10)
    emit(probe="pre_update_fold", ms=round(ms, 2), compile_s=round(cs, 1))

    def post_only(state, rollout):
        snapshot = (state.actor, state.critic, state.hooks, state.opt_state)
        rollout = dict(rollout)
        rollout["advantage"] = rollout["reward"]
        state, m = composite.post_update(state, rollout, snapshot)
        return m["kl_divergence"]

    g = jax.jit(post_only)
    ms, cs = timeit(lambda: g(state, rollout), warmup=2, iters=10)
    emit(probe="post_update_fold", ms=round(ms, 2), compile_s=round(cs, 1))

    # Minibatch scan exactly as update_body runs it (flat make_plan path).
    def scan_only(state, rollout, key):
        rollout = dict(rollout)
        rollout["advantage"] = rollout["reward"]
        rollout["return"] = rollout["reward"]
        rollout["next_value"] = rollout["value"]
        capacity, parallelism = T, num_envs
        static_meta, meta_arrays, indices = agent.sampler.make_plan(key, capacity, parallelism, rollout)

        def flat_step(carry, xs):
            meta_i, idx = xs
            metadata = {**static_meta, **meta_i}
            batch = agent.sampler.gather(rollout, idx)
            from cusrl_tpu.nn.base import combine, partition
            from cusrl_tpu.template.actor_critic import params_view, state_with_view

            view = params_view(carry)
            params, rest = partition(view)

            def loss_fn(p):
                st = state_with_view(carry, combine(p, rest))
                st2, batch2, objectives, m_obj = composite.objective(st, metadata, batch)
                return sum(jnp.asarray(v, jnp.float32) for v in objectives.values()), st2.hooks

            (_, new_hooks), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            st = carry.replace(hooks=new_hooks)
            st, grads, _ = composite.pre_optim(st, grads)
            new_params, new_opt = agent.optimizer.apply(grads, st.opt_state, params, st.learning_rates)
            merged = combine(new_params, partition(params_view(st))[1])
            st = state_with_view(st, merged).replace(opt_state=new_opt)
            return st, 0.0

        state, _ = jax.lax.scan(flat_step, state, (meta_arrays, indices))
        return state.iteration

    h = jax.jit(scan_only)
    ms, cs = timeit(lambda: h(state, rollout, jax.random.key(5)), warmup=2, iters=10)
    emit(probe="minibatch_scan_only", ms=round(ms, 2), compile_s=round(cs, 1))




def rollout_probe():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    emit(devices=[str(d) for d in jax.devices()])
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
    driver = ScanRolloutDriver(agent, env, packed=False)

    def collect():
        transitions, aggregates = driver.collect(T)
        return aggregates

    ms, cs = timeit(lambda: collect(), warmup=2, iters=10)
    emit(probe="rollout_only", ms=round(ms, 2), compile_s=round(cs, 1))

    # Isolate the actor act step at rollout shapes: one step, 4096 rows.
    state = agent.state
    obs = jax.random.normal(jax.random.key(0), (num_envs, env.spec.observation_dim), jnp.float32)
    memory = state.actor.init_memory(num_envs)

    def act24(state, obs, memory, key):
        def body(carry, k):
            mem = carry
            dist, (action, logp), new_mem, _ = state.actor.explore(obs, k, mem)
            return new_mem, action[0, 0]

        return jax.lax.scan(body, memory, jax.random.split(key, T))

    f = jax.jit(act24)
    ms, cs = timeit(lambda: f(state, obs, memory, jax.random.key(1)), warmup=2, iters=10)
    emit(probe="actor_explore_x24", ms=round(ms, 2), compile_s=round(cs, 1))

    # And the critic value step (non-deferred ValueComputation runs it per act).
    cmem = state.critic.init_memory(num_envs)

    def value24(state, obs, cmem):
        def body(carry, _):
            v, new_mem, _ = state.critic(obs, carry)
            return new_mem, v[0, 0]

        return jax.lax.scan(body, cmem, None, length=T)

    g = jax.jit(value24)
    ms, cs = timeit(lambda: g(state, obs, cmem), warmup=2, iters=10)
    emit(probe="critic_value_x24", ms=round(ms, 2), compile_s=round(cs, 1))


if __name__ == "__main__":
    if os.environ.get("ATTN_ROLLOUT") == "1":
        rollout_probe()
    elif os.environ.get("ATTN_BISECT") == "1":
        bisect()
    else:
        main()
