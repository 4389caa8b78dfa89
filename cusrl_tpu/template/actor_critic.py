"""Actor-Critic agent (counterpart of cusrl/template/actor_critic.py:151-427).

TPU-native architecture: ALL device state — actor, critic, every hook's modules
and statistics, optimizer state, per-group learning rates — lives in ONE pytree
(:class:`AgentState`).  The three lifecycle entry points compile to three jitted
functions:

* ``_act_fn(state, obs, env_state, memory, key)``    — pre_act hooks -> explore ->
  post_act hooks.  One device dispatch per env step in the host-loop driver; the
  scan driver (template/rollout.py) inlines the same body into a fused lax.scan.
* ``_step_fn(state, transition, memory, ...)``       — post_step hooks + memory reset.
* ``_update_fn(state, rollout, key)``                — pre_update hooks (GAE etc.),
  then ONE ``lax.scan`` over all epochs x minibatches: gather batch -> hook
  objectives -> grad -> gradient hooks (clipping) -> optimizer -> post_objective
  hooks; finally post_update hooks (KL LR control with snapshot-based update
  rejection — trivially expressed here because the pre-update state is just a
  value).

Distributed execution: parameters are replicated and the batch is sharded over
the ``data`` mesh axis, so XLA inserts the gradient all-reduce inside
``_update_fn`` automatically — the TPU equivalent of the reference's manual
flat-tensor ``reduce_gradients`` (cusrl/utils/distributed.py:145-172).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterable, Mapping
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cusrl_tpu.nn.base import Module, combine, partition, reset_memory, storable_memory, tree_paths
from cusrl_tpu.nn.module.actor import Actor, ActorFactory
from cusrl_tpu.nn.module.critic import Value, ValueFactory
from cusrl_tpu.template.agent import Agent, AgentFactory
from cusrl_tpu.template.buffer import Buffer
from cusrl_tpu.template.environment import EnvironmentSpec
from cusrl_tpu.template.hook import Hook, HookComposite, find_hook
from cusrl_tpu.template.optimizer import OptimizerFactory, build_optimizer

__all__ = ["ActorCritic", "ActorCriticFactory", "AgentState"]


class AgentState(Module):
    """The complete on-device training state as one pytree."""

    actor: Actor
    critic: Value
    hooks: tuple[Hook, ...]
    opt_state: Any
    learning_rates: dict[str, jax.Array]
    iteration: jax.Array  # int32 scalar


def params_view(state: AgentState) -> dict:
    """Re-keys the differentiable subtree with stable dotted names:
    ``actor...``, ``critic...``, ``hooks.<hook_name>...`` — the naming contract
    consumed by optimizer param groups and GradientClipping."""
    return {
        "actor": state.actor,
        "critic": state.critic,
        "hooks": {hook.hook_name: hook for hook in state.hooks},
    }


def state_with_view(state: AgentState, view: dict) -> AgentState:
    hooks = tuple(view["hooks"][hook.hook_name] for hook in state.hooks)
    return state.replace(actor=view["actor"], critic=view["critic"], hooks=hooks)


class _KeyRecorder(dict):
    """Batch-dict view that records which fields the hook fold reads.

    ``[]``/``get``/``in`` record the key; enumerating the dict (``keys``,
    ``items``, ``values``, iteration) trips the conservative fallback flag —
    the caller then keeps every field."""

    def __init__(self, data, accessed: set, fallback: list):
        super().__init__(data)
        self._accessed = accessed
        self._fallback = fallback

    def copy(self):
        return _KeyRecorder(dict.items(self), self._accessed, self._fallback)

    def __getitem__(self, key):
        self._accessed.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        self._accessed.add(key)
        return super().get(key, default)

    def __contains__(self, key):
        self._accessed.add(key)
        return super().__contains__(key)

    def keys(self):
        self._fallback[0] = True
        return super().keys()

    def items(self):
        self._fallback[0] = True
        return super().items()

    def values(self):
        self._fallback[0] = True
        return super().values()

    def __iter__(self):
        self._fallback[0] = True
        return super().__iter__()


class ActorCritic(Agent):
    Factory: type["ActorCriticFactory"]  # assigned below

    def __init__(
        self,
        environment_spec: EnvironmentSpec,
        actor_factory: ActorFactory,
        critic_factory: ValueFactory,
        optimizer_factory: OptimizerFactory | Mapping[str, OptimizerFactory],
        sampler,
        hooks: Iterable[Hook],
        num_steps_per_update: int,
        name: str = "Agent",
    ):
        super().__init__(environment_spec=environment_spec, num_steps_per_update=num_steps_per_update, name=name)
        self._packed_driver = None  # set by ScanRolloutDriver's packed fast path
        self.value_dim = environment_spec.reward_dim
        self.buffer_capacity = num_steps_per_update
        self.actor_factory = actor_factory
        self.critic_factory = critic_factory
        self.optimizer_factory = optimizer_factory
        self.sampler = sampler

        # -- build modules (host-side, once) ----------------------------------
        actor_key, critic_key = jax.random.split(self.next_key())
        self._boot_actor = actor_factory(self.observation_dim, self.action_dim, actor_key)
        self._boot_critic = critic_factory(self.state_dim, self.value_dim, critic_key, action_dim=self.action_dim)
        self.buffer = Buffer(self.buffer_capacity, self.parallelism)

        hooks = list(hooks)
        initialized_hooks = []
        self._boot_hooks = initialized_hooks
        # Hooks initializing early may look up later hooks by name (get_hook
        # falls back to this not-yet-initialized remainder during boot).
        self._boot_pending = hooks
        for index, hook in enumerate(hooks):
            self._boot_pending = hooks[index + 1 :]
            initialized_hooks.append(hook.init(self, self.next_key()))
        self._boot_pending = []
        names = [h.hook_name for h in initialized_hooks]
        if len(names) != len(set(names)):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise RuntimeError(f"Duplicate hook names: {dupes}; use .named() to disambiguate")

        view = {
            "actor": self._boot_actor,
            "critic": self._boot_critic,
            "hooks": {h.hook_name: h for h in initialized_hooks},
        }
        trainable, _ = partition(view)
        self.optimizer = build_optimizer(optimizer_factory, trainable)

        self.state = AgentState(
            actor=self._boot_actor,
            critic=self._boot_critic,
            hooks=tuple(initialized_hooks),
            opt_state=self.optimizer.init(trainable),
            learning_rates=self.optimizer.init_learning_rates(),
            iteration=jnp.zeros((), jnp.int32),
        )
        # Canonicalize python-scalar leaves (hook mutables) to arrays now: the
        # first traced update would promote them anyway, and the float->array
        # treedef change would force a SECOND full compile of every jitted path.
        self.state = jax.tree.map(
            lambda leaf: jnp.asarray(leaf, jnp.float32) if isinstance(leaf, float) else leaf, self.state
        )
        del self._boot_actor, self._boot_critic, self._boot_hooks

        for index, hook in enumerate(self.state.hooks):
            new_hook = hook.post_init(self)
            if new_hook is not hook:
                hooks_list = list(self.state.hooks)
                hooks_list[index] = new_hook
                self.state = self.state.replace(hooks=tuple(hooks_list))

        self.actor_memory = self.state.actor.init_memory(self.parallelism)
        self._composite = HookComposite(inference_mode=False)
        self._act_jit = None
        self._step_jit = None
        self._update_jit = None
        self._apply_schedules(0)

    # -- state access (packed-carry aware) -------------------------------------
    #
    # When the fused scan driver runs in packed-carry mode, the authoritative
    # training state lives in a few flat device buffers; ``self._state`` is a
    # lazily-synchronized view.  Reading ``state`` synchronizes on demand;
    # writing it pulls any pending device updates first, then invalidates the
    # packed buffers so the next iteration re-packs from the written value.

    @property
    def state(self) -> "AgentState":
        driver = getattr(self, "_packed_driver", None)
        if driver is not None and driver.packed_dirty:
            driver.sync_to_agent()
        return self._state

    @state.setter
    def state(self, value: "AgentState") -> None:
        driver = getattr(self, "_packed_driver", None)
        if driver is not None and driver.packed_dirty:
            driver.sync_to_agent()
        self._state = value
        if driver is not None:
            driver.invalidate_packed()

    # -- convenient views ------------------------------------------------------

    @property
    def actor(self) -> Actor:
        return self.state.actor if hasattr(self, "_state") else self._boot_actor

    @property
    def critic(self) -> Value:
        return self.state.critic if hasattr(self, "_state") else self._boot_critic

    @property
    def hook(self):
        return _HookAccessor(self)

    def replace_modules(self, actor: Actor | None = None, critic: Value | None = None) -> None:
        """Swaps in new actor/critic pytrees (used by initialization hooks).
        Works both during construction (boot phase) and afterwards."""
        if hasattr(self, "_state"):
            updates = {}
            if actor is not None:
                updates["actor"] = actor
            if critic is not None:
                updates["critic"] = critic
            self.state = self.state.replace(**updates)
        else:
            if actor is not None:
                self._boot_actor = actor
            if critic is not None:
                self._boot_critic = critic

    def get_hook(self, hook_name: str) -> Hook:
        if hasattr(self, "_state"):
            return find_hook(self.state.hooks, hook_name)[1]
        return find_hook(tuple(self._boot_hooks) + tuple(getattr(self, "_boot_pending", ())), hook_name)[1]

    def update_hook(self, hook_name: str, new_hook: Hook) -> None:
        hooks = list(self.state.hooks)
        index, _ = find_hook(tuple(hooks), hook_name)
        hooks[index] = new_hook
        self.state = self.state.replace(hooks=tuple(hooks))

    # -- traced bodies (shared by host-loop jits and the scan driver) ----------

    def act_body(self, state: AgentState, observation, env_state, memory, key, *, deterministic: bool):
        """Pure: returns (state, transition, action, new_memory)."""
        transition: dict[str, Any] = {"observation": observation}
        if env_state is not None:
            transition["state"] = env_state
        state, transition = self._composite.pre_act(state, transition)
        obs = transition["observation"]
        if deterministic:
            # Deterministic path: mode of the distribution.
            latent, new_memory, _aux = state.actor.backbone(obs, memory)
            action = state.actor.distribution.determine(latent)
            dist_params = state.actor.distribution(latent)
            action_logp = state.actor.compute_logp(dist_params, action)
        else:
            dist_params, (action, action_logp), new_memory, _aux = state.actor.explore(obs, key, memory)
        if memory is not None:
            transition["actor_memory"] = storable_memory(memory, obs.shape[0])
        transition.update(action_dist=dist_params, action=action, action_logp=action_logp)
        state, transition = self._composite.post_act(state, transition)
        return state, transition, transition["action"], new_memory

    def step_body(self, state: AgentState, transition: dict, memory):
        """Pure: returns (state, transition, new_memory)."""
        transition["done"] = transition["terminated"] | transition["truncated"]
        state, transition = self._composite.post_step(state, transition)
        new_memory = reset_memory(memory, transition["done"])
        return state, transition, new_memory

    def _record_batch_keys(self, state: AgentState, metadata: dict, flat: dict):
        """Trace-time probe: runs the objective + post_objective fold once on a
        1-row recording view of the flattened rollout and returns the set of
        batch fields it reads (None = keep everything).  The probe's tracer
        computation has no consumers, so XLA dead-code-eliminates it; only the
        recorded key set survives, letting the epoch machinery skip shuffling
        fields the update never touches."""
        accessed: set = set()
        fallback = [False]
        example = {k: jax.tree.map(lambda x: x[:1], v) for k, v in flat.items()}
        metadata = {**metadata, "epoch_index": jnp.zeros((), jnp.int32), "mini_batch_index": jnp.zeros((), jnp.int32)}
        recorder = _KeyRecorder(example, accessed, fallback)
        try:
            probe_state, batch2, _obj, _m = self._composite.objective(state, metadata, recorder)
            self._composite.post_objective(probe_state, metadata, batch2)
        except Exception:
            return None
        if fallback[0]:
            return None
        return accessed

    def update_body(self, state: AgentState, rollout: dict, key: jax.Array, buffer_state: dict | None = None):
        """Pure: returns (state, metrics). The whole learner step.

        ``buffer_state`` (optional, traced ``{"cursor", "full"}``) lets the
        random samplers honor partially-filled / wrapped circular buffers
        (reference: cusrl/sampler/random_sampler.py:47-76); ``None`` means the
        rollout is statically full (the fused scan path)."""
        snapshot = (state.actor, state.critic, state.hooks, state.opt_state)
        state, rollout, metrics_pre = self._composite.pre_update(state, rollout)

        capacity, parallelism = jax.tree.leaves(rollout["action"])[0].shape[:2]

        def train_step(carry: AgentState, metadata: dict, batch: dict):
            view = params_view(carry)
            params, rest = partition(view)

            def loss_fn(p):
                full_view = combine(p, rest)
                st = state_with_view(carry, full_view)
                st2, batch2, objectives, m_obj = self._composite.objective(st, metadata, batch)
                if objectives:
                    loss = sum(jnp.asarray(v, jnp.float32) for v in objectives.values())
                else:
                    loss = jnp.zeros((), jnp.float32)
                return loss, (st2.hooks, objectives, m_obj, batch2)

            # Whether any hook produces a loss is a trace-time (static) fact:
            # probe once, the unused probe computation is DCE'd by XLA.
            probe_state, probe_batch, probe_obj, probe_metrics = self._composite.objective(carry, metadata, batch)
            if probe_obj:
                (_, (new_hooks, objectives, m_obj, batch2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params
                )
                st = carry.replace(hooks=new_hooks)
                st, grads, m_clip = self._composite.pre_optim(st, grads)
                new_params, new_opt_state = self.optimizer.apply(grads, st.opt_state, params, st.learning_rates)
                merged = combine(new_params, partition(params_view(st))[1])
                st = state_with_view(st, merged).replace(opt_state=new_opt_state)
                step_metrics = {**objectives, **m_obj, **m_clip}
            else:
                st, batch2 = probe_state, probe_batch
                step_metrics = dict(probe_metrics)

            st, m_post_obj = self._composite.post_objective(st, metadata, batch2)
            step_metrics.update(m_post_obj)
            return st, step_metrics

        # TPU fast path: tile-granular shuffles, minibatches as tile gathers
        # (random ROW gathers of the full rollout are HBM-catastrophic).
        epoch_plan = None
        if hasattr(self.sampler, "make_epoch_plan"):
            epoch_plan = self.sampler.make_epoch_plan(key, capacity, parallelism, rollout)

        if epoch_plan is not None:
            # A list of plans = contiguous epoch segments with differing
            # minibatch counts (reference's per-epoch `num_mini_batches`
            # sequence); each segment is its own compiled scan.
            plans = epoch_plan if isinstance(epoch_plan, list) else [epoch_plan]
            flat_full = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rollout)

            # Restrict the shuffled/gathered fields to those the objective fold
            # actually reads (trace-time recording probe; hooks that enumerate
            # the batch fall back to the full field set).  The rollout holds
            # ~2x more bytes than the update consumes (next_observation,
            # rewards, done flags only feed pre/post-update passes), so this
            # halves per-epoch HBM traffic.
            needed = self._record_batch_keys(state, dict(plans[0][0]), flat_full)
            if needed is not None:
                flat_full = {k: v for k, v in flat_full.items() if k in needed}

            seg_sums: dict[str, Any] = {}
            seg_counts: dict[str, Any] = {}
            for static_meta, epoch_perms, batch_size in plans:
                flat = flat_full
                num_mb = static_meta["total_mini_batches"]
                block = static_meta.get("shuffle_block", 1)
                use_tile_gather = block > 1 and batch_size % block == 0
                if use_tile_gather:
                    tiles_per_mb = batch_size // block
                    tiled = jax.tree.map(lambda x: x.reshape((-1, block) + x.shape[1:]), flat)

                def epoch_body(carry, xs, *, num_mb=num_mb, static_meta=static_meta, batch_size=batch_size,
                               block=block, use_tile_gather=use_tile_gather,
                               tiled=tiled if use_tile_gather else None,
                               tiles_per_mb=tiles_per_mb if use_tile_gather else None, flat=flat):
                    epoch_index, perm = xs
                    if use_tile_gather:
                        # Fused shuffle+slice: each minibatch gathers its own
                        # contiguous-tile subset of the epoch permutation
                        # directly from the rollout — no materialized shuffled
                        # copy.  Bit-identical to shuffle-then-slice.
                        def mb_body(inner_carry, mb_index):
                            idx = jax.lax.dynamic_slice_in_dim(perm, mb_index * tiles_per_mb, tiles_per_mb, 0)
                            batch = jax.tree.map(
                                lambda x: x[idx].reshape((batch_size,) + x.shape[2:]), tiled
                            )
                            metadata = {**static_meta, "epoch_index": epoch_index, "mini_batch_index": mb_index}
                            return train_step(inner_carry, metadata, batch)

                        return jax.lax.scan(mb_body, carry, jnp.arange(num_mb))

                    if block > 1:
                        shuffled = jax.tree.map(
                            lambda x: x.reshape((-1, block) + x.shape[1:])[perm].reshape(x.shape), flat
                        )
                    else:
                        shuffled = jax.tree.map(lambda x: x[perm], flat)

                    def mb_body(inner_carry, mb_index):
                        batch = jax.tree.map(
                            lambda x: jax.lax.dynamic_slice_in_dim(x, mb_index * batch_size, batch_size, 0),
                            shuffled,
                        )
                        metadata = {**static_meta, "epoch_index": epoch_index, "mini_batch_index": mb_index}
                        return train_step(inner_carry, metadata, batch)

                    return jax.lax.scan(mb_body, carry, jnp.arange(num_mb))

                num_epochs = static_meta.get("segment_epochs", static_meta["total_epochs"])
                epoch_start = static_meta.get("epoch_start", 0)
                state, stacked = jax.lax.scan(
                    epoch_body, state, (jnp.arange(epoch_start, epoch_start + num_epochs), epoch_perms)
                )
                steps = num_epochs * num_mb
                for k, v in stacked.items():
                    seg_sums[k] = seg_sums.get(k, 0.0) + jnp.sum(v)
                    seg_counts[k] = seg_counts.get(k, 0) + steps
            metrics_steps = {k: seg_sums[k] / seg_counts[k] for k in seg_sums}
        else:
            import inspect

            if buffer_state is not None and "buffer_state" in inspect.signature(self.sampler.make_plan).parameters:
                plan = self.sampler.make_plan(key, capacity, parallelism, rollout, buffer_state=buffer_state)
            else:
                plan = self.sampler.make_plan(key, capacity, parallelism, rollout)

            plans = plan if isinstance(plan, list) else [plan]
            # Same batch-key restriction as the epoch-plan branch: gather only
            # the fields the objective fold reads (the rollout holds ~2x more
            # bytes — and, on recurrent paths, the [1, N, cache...] memory
            # snapshots re-gathered every minibatch are the dominant ones).
            gather_src = rollout
            if plans and plans[0][2] is not None:
                needed = self._record_batch_keys(state, dict(plans[0][0]), rollout)
                if needed is not None:
                    gather_src = {k: v for k, v in rollout.items() if k in needed}
            seg_sums: dict[str, Any] = {}
            seg_counts: dict[str, Any] = {}
            for static_meta, meta_arrays, indices in plans:
                if indices is None:
                    continue

                def flat_step(carry, xs, *, static_meta=static_meta):
                    meta_i, idx = xs
                    metadata = {**static_meta, **meta_i}
                    batch = self.sampler.gather(gather_src, idx)
                    return train_step(carry, metadata, batch)

                state, stacked = jax.lax.scan(flat_step, state, (meta_arrays, indices))
                steps = jax.tree.leaves(indices)[0].shape[0]
                for k, v in stacked.items():
                    seg_sums[k] = seg_sums.get(k, 0.0) + jnp.sum(v)
                    seg_counts[k] = seg_counts.get(k, 0) + steps
            metrics_steps = {k: seg_sums[k] / seg_counts[k] for k in seg_sums}

        state, metrics_post = self._composite.post_update(state, rollout, snapshot)
        state = state.replace(iteration=state.iteration + 1)
        metrics = {**metrics_pre, **metrics_steps, **metrics_post}
        return state, metrics

    # -- host-facing API -------------------------------------------------------

    def _get_act_jit(self):
        if self._act_jit is None:

            def fn(state, observation, env_state, memory, key, deterministic):
                return self.act_body(state, observation, env_state, memory, key, deterministic=deterministic)

            self._act_jit = jax.jit(fn, static_argnames=("deterministic",))
        return self._act_jit

    def _get_step_jit(self):
        if self._step_jit is None:
            self._step_jit = jax.jit(self.step_body)
        return self._step_jit

    def _get_update_jit(self):
        if self._update_jit is None:
            self._update_jit = jax.jit(self.update_body, donate_argnums=(0,))
        return self._update_jit

    def act(self, observation, state=None):
        self._observe_io_format(observation)
        observation = jnp.asarray(observation)
        env_state = None if state is None else jnp.asarray(state)
        key = self.next_key()
        deterministic = self.deterministic and self.inference_mode
        self.state, self.transition, action, self.actor_memory = self._get_act_jit()(
            self.state, observation, env_state, self.actor_memory, key, deterministic
        )
        return self._restore_io_format(action)

    def step(self, next_observation, reward, terminated, truncated, next_state=None, **kwargs) -> bool:
        terminated = jnp.asarray(terminated)
        truncated = jnp.asarray(truncated)
        if terminated.dtype != jnp.bool_:
            raise TypeError("'terminated' must have dtype bool")
        if truncated.dtype != jnp.bool_:
            raise TypeError("'truncated' must have dtype bool")
        transition = dict(self.transition)
        transition.update(
            next_observation=jnp.asarray(next_observation),
            reward=jnp.asarray(reward),
            terminated=terminated,
            truncated=truncated,
        )
        if next_state is not None:
            transition["next_state"] = jnp.asarray(next_state)
        for key_name, value in kwargs.items():
            if value is not None:
                transition[key_name] = jax.tree.map(jnp.asarray, value)

        self.state, transition, self.actor_memory = self._get_step_jit()(self.state, transition, self.actor_memory)
        self.transition = transition
        if not self.inference_mode:
            self.buffer.push(transition)
        should = super().step(next_observation, reward, terminated, truncated, next_state=next_state)
        return should and all(h.should_update(self) for h in self.state.hooks if h.active)

    def update(self) -> dict[str, float]:
        if self.inference_mode:
            return super().update()
        rollout = self.buffer.data
        key = self.next_key()
        # Fill state as TRACED scalars: samplers bound their draws by it
        # without a recompile per cursor value.
        buffer_state = {
            "cursor": jnp.asarray(self.buffer.cursor, jnp.int32),
            "full": jnp.asarray(self.buffer.full),
        }
        self.state, metrics = self._get_update_jit()(self.state, rollout, key, buffer_state)
        self.record(metrics)
        return self.finish_update()

    def finish_update(self) -> dict[str, float]:
        """Host-side tail of an update: iteration bookkeeping, schedules, metric
        summary.  The fused rollout+update driver calls this after its single
        jitted iteration (the device-side work already ran in update_body)."""
        summary = super().update()
        self._apply_schedules(self.iteration)
        return summary

    # -- schedules / inference mode -------------------------------------------

    def _apply_schedules(self, iteration: int) -> None:
        # Probe on the (possibly stale) view first: schedules depend only on the
        # iteration and static config, and in the common case nothing fires —
        # the packed-carry fast path then skips a full state synchronization.
        probe_hooks = self._state.hooks
        if all(h.schedule_is_noop(iteration) for h in probe_hooks if h.active):
            return
        hooks = list(self.state.hooks)  # force sync; schedules mutate for real
        changed = False
        for index, hook in enumerate(hooks):
            if not hook.active:
                continue
            new_hook = hook.apply_schedule(iteration, self)
            if new_hook is not hook:
                hooks[index] = new_hook
                changed = True
        if changed:
            self.state = self.state.replace(hooks=tuple(hooks))

    def set_iteration(self, iteration: int) -> None:
        if iteration != self.iteration:
            super().set_iteration(iteration)
            self.state = self.state.replace(iteration=jnp.asarray(iteration, jnp.int32))
            self._apply_schedules(iteration)

    def set_inference_mode(self, deterministic: bool = True) -> None:
        super().set_inference_mode(deterministic)
        self._composite = HookComposite(inference_mode=True)
        # Hooks may adapt to inference (e.g. ObservationNormalization freezes
        # its statistics while still normalizing).
        hooks = list(self.state.hooks)
        changed = False
        for index, hook in enumerate(hooks):
            adapt = getattr(hook, "set_inference_mode", None)
            if adapt is not None:
                new_hook = adapt(True)
                if new_hook is not hook:
                    hooks[index] = new_hook
                    changed = True
        if changed:
            self.state = self.state.replace(hooks=tuple(hooks))
        self._act_jit = self._step_jit = None

    def resize_buffer(self, capacity: int) -> None:
        if capacity != self.buffer_capacity:
            self.buffer_capacity = capacity
            self.buffer.resize(capacity)
            self._update_jit = None  # new [T] shape -> recompile

    # -- checkpointing ---------------------------------------------------------

    @staticmethod
    def _leaf_to_numpy(leaf):
        # Typed PRNG keys (e.g. hook rng state) serialize as their raw key data.
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(leaf))
        return np.asarray(leaf)

    def state_dict(self) -> dict[str, Any]:
        result = super().state_dict()
        result["agent_state"] = {path: self._leaf_to_numpy(leaf) for path, leaf in tree_paths(self.state)}
        result["actor_memory"] = None if self.actor_memory is None else jax.tree.map(np.asarray, self.actor_memory)
        return result

    def load_state_dict(self, state_dict: dict[str, Any]) -> None:
        super().load_state_dict(state_dict)
        saved = state_dict.get("agent_state")
        if saved is None:
            self.warn("No 'agent_state' entry in checkpoint.")
            return
        current = {path: leaf for path, leaf in tree_paths(self.state)}
        unused = set(saved) - set(current)
        restored = {}
        for path, leaf in current.items():
            if path not in saved:
                self.warn(f"No checkpoint entry for '{path}'; keeping initialization.")
                restored[path] = leaf
                continue
            value = np.asarray(saved[path])
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
                key_data = jax.random.key_data(leaf)
                if tuple(value.shape) != tuple(key_data.shape):
                    self.warn(f"Shape mismatch for '{path}': ckpt {value.shape} vs key {key_data.shape}; skipped.")
                    restored[path] = leaf
                    continue
                restored[path] = jax.random.wrap_key_data(
                    jnp.asarray(value, key_data.dtype), impl=jax.random.key_impl(leaf)
                )
                continue
            leaf_np = np.asarray(leaf)
            if tuple(value.shape) != tuple(leaf_np.shape):
                self.warn(f"Shape mismatch for '{path}': ckpt {value.shape} vs model {leaf_np.shape}; skipped.")
                restored[path] = leaf
                continue
            dtype = np.float32 if leaf_np.dtype == np.float64 else leaf_np.dtype
            restored[path] = jnp.asarray(value, dtype)
        if unused:
            self.warn(f"Unused checkpoint keys: {sorted(unused)[:8]}{'...' if len(unused) > 8 else ''}")
        treedef = jax.tree.structure(self.state)
        ordered = [restored[path] for path, _ in tree_paths(self.state)]
        self.state = jax.tree_util.tree_unflatten(treedef, ordered)
        if state_dict.get("actor_memory") is not None and self.actor_memory is not None:
            self.actor_memory = jax.tree.map(
                lambda cur, new: jnp.asarray(new, cur.dtype), self.actor_memory, state_dict["actor_memory"]
            )
        self.set_iteration(int(state_dict.get("iteration", self.iteration)))

    def export(self, output_dir: str, **kwargs) -> None:
        from cusrl_tpu.export import export_agent

        export_agent(self, output_dir, **kwargs)


class _HookAccessor:
    """Dotted access: ``agent.hook["name"]`` / iteration over hooks."""

    def __init__(self, agent: ActorCritic):
        self._agent = agent

    def __getitem__(self, name: str) -> Hook:
        return self._agent.get_hook(name)

    def __iter__(self):
        return iter(self._agent.state.hooks)


@dataclasses.dataclass(kw_only=True)
class ActorCriticFactory(AgentFactory):
    actor_factory: ActorFactory
    critic_factory: ValueFactory
    optimizer_factory: Any
    sampler: Any
    hooks: list[Hook] = dataclasses.field(default_factory=list)

    def __call__(self, environment_spec: EnvironmentSpec) -> ActorCritic:
        return ActorCritic(
            environment_spec=environment_spec,
            actor_factory=self.actor_factory,
            critic_factory=self.critic_factory,
            optimizer_factory=self.optimizer_factory,
            sampler=self.sampler,
            hooks=self.hooks,
            num_steps_per_update=self.num_steps_per_update,
            name=self.name,
        )

    # -- hook list editing (cusrl/template/actor_critic.py:97-148) -------------

    def register_hook(self, hook: Hook, index: int | None = None, before: str | None = None, after: str | None = None):
        if (index is not None) + (before is not None) + (after is not None) > 1:
            raise ValueError("Only one of index, before, or after can be specified")
        if before is not None:
            index = self.get_hook_index(before)
        elif after is not None:
            index = self.get_hook_index(after) + 1
        elif index is None:
            index = len(self.hooks)
        self.hooks.insert(index, hook)
        return self

    def get_hook(self, hook_name: str) -> Hook:
        return self.hooks[self.get_hook_index(hook_name)]

    def get_hook_index(self, hook_name: str) -> int:
        for i, hook in enumerate(self.hooks):
            if hook.hook_name == hook_name:
                return i
        raise ValueError(f"No hook named '{hook_name}' is registered")

    def remove_hook(self, hook_name: str):
        self.hooks.pop(self.get_hook_index(hook_name))
        return self


ActorCritic.Factory = ActorCriticFactory
