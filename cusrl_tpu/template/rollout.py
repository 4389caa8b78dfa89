"""Fused scan rollout driver — the TPU performance path.

Fuses ``hooks.pre_act -> actor.explore -> hooks.post_act -> env.step ->
hooks.post_step -> memory reset -> episode-stat aggregation`` into ONE
``lax.scan`` compiled once per rollout length.  The reference drives this loop
from Python (cusrl/template/trainer.py:296-315); on TPU that would serialize
device dispatches, so the whole rollout executes as a single XLA program and
transitions are produced directly in the buffer's ``[T, N, ...]`` layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cusrl_tpu.template.environment import JaxEnvironment

__all__ = ["ScanRolloutDriver"]


class ScanRolloutDriver:
    def __init__(self, agent, environment: JaxEnvironment, packed: bool = True):
        self.agent = agent
        self.environment = environment
        self._env_state = None
        self._cum_reward = None
        self._cum_length = None
        self._rollout_jit = jax.jit(self._rollout, static_argnames=("num_steps",), donate_argnums=(0, 1, 4, 5))
        # Packed-carry fast path: the training carry (agent state, env state,
        # memory, stats) crosses the jit boundary as a few flat per-dtype
        # buffers instead of hundreds of leaves.  Dispatch cost is per-ARGUMENT
        # (~0.3 ms/leaf over remote-TPU transports — a 60 ms floor for a
        # 200-leaf AgentState), so packing removes most of the per-iteration
        # overhead.  The agent's ``state`` property synchronizes lazily.
        self._use_packed = packed
        self._packer = None
        self._packed = None
        self._packed_valid = False
        self._agent_stale = False
        agent._packed_driver = self

    # -- traced ---------------------------------------------------------------

    def _rollout(self, agent_state, env_state, observation, env_obs_state, memory, stats_carry, key, *, num_steps):
        keys = jax.random.split(key, num_steps)

        # Memory-slim stacking: BPTT only ever consumes the rollout-INITIAL
        # memory snapshot ([0] of each memory-suffixed stack), and that value
        # is available HERE, before the scan — the actor's carry plus each
        # hook's declared entries (Hook.rollout_memory_entries).  Dropping the
        # per-step entries from the scanned ys DCEs the whole [T, N, cache...]
        # stack (measured ~25 ms/iter of dead HBM writes for two [N, H, W+1, D]
        # ring caches at the transformer bench config).  Samplers that truly
        # need per-step memory (TemporalRandomSampler) keep full stacking, as
        # do hooks that don't implement the protocol.
        slim_keys: set[str] = set()
        initial_memories: dict[str, object] = {}
        if not getattr(self.agent.sampler, "requires_per_step_memory", False):
            from cusrl_tpu.nn.base import storable_memory

            batch = observation.shape[0] if hasattr(observation, "shape") else None
            if memory is not None and batch is not None:
                initial_memories["actor_memory"] = storable_memory(memory, batch)
            for hook in agent_state.hooks:
                if not hook.active:
                    continue
                for key_name, value in hook.rollout_memory_entries().items():
                    if value is not None and batch is not None:
                        initial_memories[key_name] = storable_memory(value, batch)
            slim_keys = set(initial_memories)

        def body(carry, key_t):
            agent_state, env_state, observation, env_obs_state, memory, (cum_reward, cum_length) = carry
            act_key, env_key = jax.random.split(key_t)

            agent_state, transition, action, memory = self.agent.act_body(
                agent_state, observation, env_obs_state, memory, act_key, deterministic=False
            )
            env_state, reward, terminated, truncated, info = self.environment.step_fn(env_state, action, env_key)
            next_observation, next_env_obs_state = self.environment.observe_fn(env_state)

            transition["next_observation"] = next_observation
            if next_env_obs_state is not None:
                transition["next_state"] = next_env_obs_state
            transition["reward"] = reward
            transition["terminated"] = terminated
            transition["truncated"] = truncated
            for name, value in (info or {}).items():
                transition[name] = value

            agent_state, transition, memory = self.agent.step_body(agent_state, transition, memory)

            done = transition["done"].reshape(-1)
            cum_reward = cum_reward + reward.sum(-1)
            cum_length = cum_length + 1
            step_stats = (
                jnp.sum(jnp.where(done, 1.0, 0.0)),
                jnp.sum(jnp.where(done, cum_reward, 0.0)),
                jnp.sum(jnp.where(done, cum_length.astype(jnp.float32), 0.0)),
            )
            cum_reward = jnp.where(done, 0.0, cum_reward)
            cum_length = jnp.where(done, 0, cum_length)

            if slim_keys:
                transition = {k: v for k, v in transition.items() if k not in slim_keys}
            new_carry = (agent_state, env_state, next_observation, next_env_obs_state, memory, (cum_reward, cum_length))
            return new_carry, (transition, step_stats)

        init = (agent_state, env_state, observation, env_obs_state, memory, stats_carry)
        carry, (transitions, step_stats) = jax.lax.scan(body, init, keys)
        aggregates = jnp.stack([jnp.sum(s) for s in step_stats])  # (episodes, return_sum, length_sum)
        # Reconstruct the (dropped) memory entries as [1, N, ...] snapshots,
        # and truncate any remaining memory-suffixed stacks from hooks without
        # the rollout_memory_entries protocol — both consumed at [0] only (the
        # sequence-mode re-evaluation replays from the rollout-INITIAL state).
        if not getattr(self.agent.sampler, "requires_per_step_memory", False):
            transitions = {
                key_name: (jax.tree.map(lambda x: x[:1], value) if key_name.endswith("memory") else value)
                for key_name, value in transitions.items()
            }
            for key_name, value in initial_memories.items():
                transitions[key_name] = jax.tree.map(lambda x: x[None], value)
        return carry, transitions, aggregates

    # -- fused rollout + update (one dispatch per iteration) -------------------

    def _build_fused(self, num_steps: int):
        metric_keys: list[str] = []

        def iteration(agent_state, env_state, observation, env_obs_state, memory, stats_carry, key):
            rollout_key, update_key = jax.random.split(key)
            carry, transitions, aggregates = self._rollout(
                agent_state, env_state, observation, env_obs_state, memory, stats_carry, rollout_key,
                num_steps=num_steps,
            )
            agent_state = carry[0]
            agent_state, metrics = self.agent.update_body(agent_state, transitions, update_key)
            if not metric_keys:  # populated once at trace time
                metric_keys.extend(sorted(metrics))
            stacked = jnp.stack([jnp.asarray(metrics[k], jnp.float32).reshape(()) for k in sorted(metrics)])
            carry = (agent_state, *carry[1:])
            return carry, aggregates, stacked

        fused = jax.jit(iteration, donate_argnums=(0, 1, 4, 5))
        return fused, metric_keys

    # -- packed-carry coherence (consumed by ActorCritic.state property) -------

    @property
    def packed_dirty(self) -> bool:
        return self._agent_stale

    def invalidate_packed(self) -> None:
        self._packed_valid = False

    def _carry_tuple(self):
        return (
            self.agent._state,
            self._env_state,
            self._observation,
            self._obs_state,
            self.agent.actor_memory,
            (self._cum_reward, self._cum_length),
        )

    def _store_carry(self, carry) -> None:
        (
            self.agent._state,
            self._env_state,
            self._observation,
            self._obs_state,
            self.agent.actor_memory,
            (self._cum_reward, self._cum_length),
        ) = carry

    def sync_to_agent(self) -> None:
        """Unpacks the authoritative device buffers back into the agent/driver
        host-side views (one many-output dispatch — called lazily/rarely)."""
        if not self._agent_stale:
            return
        self._agent_stale = False
        carry = self._unpack_jit(self._packed)
        self._store_carry(carry)

    def collect_and_update(self, num_steps: int):
        """One full training iteration (rollout + update) as a single jitted
        call; returns (aggregates [3], stacked metric values [K], metric keys) —
        device arrays the caller fetches in one transfer (or not at all).  The
        Buffer is bypassed entirely — transitions never leave the XLA program."""
        agent = self.agent
        self._ensure_initialized()
        if getattr(agent, "_mesh", None) is not None:
            # Sharded runs keep the unpacked carry: flat-buffer packing would
            # erase the per-leaf NamedShardings (and dispatch overhead is a
            # single-controller concern anyway).
            self._use_packed = False
        if not self._use_packed:
            if not hasattr(self, "_fused") or self._fused_steps != num_steps:
                self._fused, self._fused_keys = self._build_fused(num_steps)
                self._fused_steps = num_steps
            carry, aggregates, stacked = self._fused(*self._carry_tuple(), agent.next_key())
            self._store_carry(carry)
            return aggregates, stacked, tuple(self._fused_keys)

        if self._packer is None or getattr(self, "_fused_steps", None) != num_steps:
            self._build_packed(num_steps)
        if not self._packed_valid:
            if self._agent_stale:
                raise RuntimeError("packed carry invalidated while device-side updates were pending")
            if jax.tree.structure(self._carry_tuple()) != self._carry_treedef:
                # Static metadata changed (schedules toggling hook statics,
                # hook replacement, ...): the packer's treedef — and the fused
                # program traced through it — bake the old statics in, so a
                # stale unpack would silently REVERT them.  Rebuild (this is
                # the documented static_field -> recompile contract).
                self._build_packed(num_steps)
            self._packed = self._pack_jit(self._carry_tuple())
            self._packed_valid = True

        self._packed, aggregates, stacked = self._fused_packed(self._packed, agent.next_key())
        self._agent_stale = True
        return aggregates, stacked, tuple(self._fused_keys)

    def collect_and_update_many(self, num_steps: int, num_iters: int):
        """Runs ``num_iters`` full training iterations in ONE jitted dispatch —
        a ``lax.scan`` over the fused rollout+update body — and advances
        ``agent.iteration`` by ``num_iters``.  Returns (aggregates
        ``[num_iters, 3]``, stacked metric values ``[num_iters, K]``, keys):
        the same per-iteration data as ``num_iters`` calls to
        ``collect_and_update``, fetched in one transfer.

        Dispatch overhead is per-call (~0.3 ms/argument over remote-TPU
        transports), so batching iterations amortizes the host-side gap between
        device programs.  Falls back to per-iteration dispatches whenever a
        hook schedule fires inside the covered range (host-side schedule
        application must interleave) or the packed fast path is off (mesh)."""
        agent = self.agent
        self._ensure_initialized()
        if getattr(agent, "_mesh", None) is not None:
            self._use_packed = False
        start = agent.iteration
        schedules_quiet = all(
            h.schedule_is_noop(it)
            for h in agent._state.hooks
            if h.active
            for it in range(start + 1, start + num_iters + 1)
        )
        if num_iters == 1 or not self._use_packed or not schedules_quiet:
            aggs, stacks, keys = [], [], ()
            for _ in range(num_iters):
                aggregates, stacked, keys = self.collect_and_update(num_steps)
                agent.iteration += 1
                apply = getattr(agent, "_apply_schedules", None)
                if apply is not None:
                    apply(agent.iteration)
                aggs.append(aggregates)
                stacks.append(stacked)
            return jnp.stack(aggs), jnp.stack(stacks), keys

        if self._packer is None or getattr(self, "_fused_steps", None) != num_steps:
            self._build_packed(num_steps)
        if not self._packed_valid:
            if self._agent_stale:
                raise RuntimeError("packed carry invalidated while device-side updates were pending")
            if jax.tree.structure(self._carry_tuple()) != self._carry_treedef:
                self._build_packed(num_steps)
            self._packed = self._pack_jit(self._carry_tuple())
            self._packed_valid = True

        cache = getattr(self, "_fused_many", None)
        if cache is None:
            cache = self._fused_many = {}
        fused = cache.get((num_steps, num_iters))
        if fused is None:
            fused = cache[(num_steps, num_iters)] = self._build_packed_many(num_steps, num_iters)

        self._packed, aggregates, stacked = fused(self._packed, agent.next_key())
        self._agent_stale = True
        agent.iteration += num_iters
        return aggregates, stacked, tuple(self._fused_keys)

    def _build_packed_many(self, num_steps: int, num_iters: int):
        packer = self._packer
        metric_keys = self._fused_keys

        def chunk(buffers, key):
            carry = packer.unpack(buffers)
            keys = jax.random.split(key, num_iters)

            def body(carry, key_i):
                rollout_key, update_key = jax.random.split(key_i)
                new_carry, transitions, aggregates = self._rollout(*carry, rollout_key, num_steps=num_steps)
                agent_state, metrics = self.agent.update_body(new_carry[0], transitions, update_key)
                if not metric_keys:
                    metric_keys.extend(sorted(metrics))
                stacked = jnp.stack([jnp.asarray(metrics[k], jnp.float32).reshape(()) for k in sorted(metrics)])
                return (agent_state, *new_carry[1:]), (aggregates, stacked)

            carry, (aggs, stacks) = jax.lax.scan(body, carry, keys)
            return packer.pack(carry), aggs, stacks

        return jax.jit(chunk, donate_argnums=(0,))

    def _build_packed(self, num_steps: int) -> None:
        from cusrl_tpu.utils.packing import TreePacker

        example = self._carry_tuple()
        packer = TreePacker(example)
        self._packer = packer
        self._carry_treedef = jax.tree.structure(example)
        self._pack_jit = jax.jit(packer.pack)
        self._unpack_jit = jax.jit(packer.unpack)
        metric_keys: list[str] = []
        self._fused_steps = num_steps
        self._fused_keys = metric_keys
        self._fused_many = {}  # (num_steps, num_iters) -> program; packer-bound

        def iteration(buffers, key):
            carry = packer.unpack(buffers)
            rollout_key, update_key = jax.random.split(key)
            new_carry, transitions, aggregates = self._rollout(*carry, rollout_key, num_steps=num_steps)
            agent_state = new_carry[0]
            agent_state, metrics = self.agent.update_body(agent_state, transitions, update_key)
            if not metric_keys:
                metric_keys.extend(sorted(metrics))
            stacked = jnp.stack([jnp.asarray(metrics[k], jnp.float32).reshape(()) for k in sorted(metrics)])
            new_carry = (agent_state, *new_carry[1:])
            return packer.pack(new_carry), aggregates, stacked

        self._fused_packed = jax.jit(iteration, donate_argnums=(0,))

    # -- host -----------------------------------------------------------------

    def reset(self) -> None:
        self._env_state = None

    def _ensure_initialized(self) -> None:
        agent = self.agent
        env = self.environment
        if self._env_state is not None:
            return
        self._env_state = env.init_fn(agent.next_key())
        self._observation, self._obs_state = env.observe_fn(self._env_state)
        n = env.num_instances
        self._cum_reward = jnp.zeros((n,), jnp.float32)
        self._cum_length = jnp.zeros((n,), jnp.int32)
        mesh = getattr(agent, "_mesh", None)
        if mesh is not None:
            # Shard environment instances over the data axis; the whole fused
            # rollout then runs SPMD with XLA-inserted collectives only where
            # global statistics demand them.
            from cusrl_tpu.parallel.sharding import shard_batch

            self._env_state = shard_batch(self._env_state, mesh, axis=0)
            self._observation = shard_batch(self._observation, mesh, axis=0)
            if self._obs_state is not None:
                self._obs_state = shard_batch(self._obs_state, mesh, axis=0)
            self._cum_reward = shard_batch(self._cum_reward, mesh, axis=0)
            self._cum_length = shard_batch(self._cum_length, mesh, axis=0)

    def collect(self, num_steps: int):
        """Runs one rollout; updates agent/env state in place; returns
        (transitions: dict of [T, N, ...] device arrays, aggregates [3])."""
        agent = self.agent
        self._ensure_initialized()
        if self._agent_stale:
            self.sync_to_agent()  # env/memory host views must be fresh here
        carry, transitions, aggregates = self._rollout_jit(
            agent.state,
            self._env_state,
            self._observation,
            self._obs_state,
            agent.actor_memory,
            (self._cum_reward, self._cum_length),
            agent.next_key(),
            num_steps=num_steps,
        )
        (
            agent.state,
            self._env_state,
            self._observation,
            self._obs_state,
            agent.actor_memory,
            (self._cum_reward, self._cum_length),
        ) = carry
        return transitions, aggregates
