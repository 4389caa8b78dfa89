"""Value computation and value loss hooks (counterpart of
cusrl/hook/on_policy/value.py:14-145).

TPU-native deviation: the reference bootstraps truncated states by evaluating the
critic only at truncated rows (data-dependent shapes).  Here, when truncation
bootstrapping is enabled, the critic runs ONE fully-batched pass over the whole
``next_state`` rollout ``[T*N]`` — static shapes, MXU-efficient — and results are
selected with masks.  Without truncation bootstrapping only the final row is
evaluated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, frozen_field, mutable_field, static_field, storable_memory
from cusrl_tpu.template.hook import Hook, validate_concrete
from cusrl_tpu.utils.dict_utils import get_first

__all__ = ["ValueComputation", "ValueLoss"]


class ValueComputation(Hook):
    """Runs the critic; fills ``value`` and ``next_value`` for the update.

    TPU optimization (``deferred``, automatic for feedforward critics): instead
    of evaluating the critic inside every rollout step (24 sequential small
    batches in the fused scan), values for the WHOLE rollout are computed in
    pre_update as one ``[T*N]`` batched pass — identical math (same parameters,
    same normalized observations), an order of magnitude better MXU utilization,
    and a critic-free rollout scan.  Recurrent critics keep the per-step path.
    """

    termination_value: float = mutable_field(default=0.0)
    memory: Memory = frozen_field(default=None)
    bootstrap_truncated_states: bool = static_field(default=True)
    # True: feedforward batched deferral.  "sequential": recurrent critics that
    # support the counterfactual-append contract (nn/base.py) run ZERO critic
    # passes inside the rollout scan — values come from one sequence-mode pass
    # in pre_update (lane/fused-block kernels at update-path MFU) and bootstrap
    # values from one eval_next_token cross-attention pass; both exact (the
    # sequence==stepwise consistency invariant).  The per-step path ran the
    # critic TWICE per rollout step (~2/3 of the transformer rollout scan's
    # time) for bootstrap values consumed only at truncated + final rows.
    # None: auto (feedforward -> True; capable recurrent -> "sequential" unless
    # CUSRL_TPU_DEFERRED_SEQ=0; otherwise False = per-step).
    deferred: bool | str | None = static_field(default=None)
    # TPU perf knob (deferred mode): bootstrap values are CONSUMED only at
    # truncated rows and the final step, so instead of a second full [T*N]
    # critic pass, gather the (at most N, when episodes span the window)
    # truncated next-states, run one [N]-row pass, and scatter back.  An
    # in-jit overflow check falls back to the full pass when more than N rows
    # truncate (short episodes), so the math is ALWAYS identical to the full
    # pass (tests/test_value_sparse_bootstrap.py).
    sparse_bootstrap: bool = static_field(default=False)

    def init(self, agent, key):
        import os

        hook = self
        if agent.environment_spec.final_state_is_missing:
            hook = hook.replace(bootstrap_truncated_states=False)
        if hook.deferred is None:
            # Samplers replaying BPTT windows from arbitrary rollout offsets
            # (requires_per_step_memory) need the per-step critic_memory
            # snapshots only the per-step path records.
            per_step_sampler = getattr(agent.sampler, "requires_per_step_memory", False)
            if not agent.critic.is_recurrent:
                hook = hook.replace(deferred=True)
            elif (
                not per_step_sampler
                and getattr(agent.critic, "supports_next_token_eval", False)
                and os.environ.get("CUSRL_TPU_DEFERRED_SEQ", "1") != "0"
            ):
                hook = hook.replace(deferred="sequential")
            else:
                hook = hook.replace(deferred=False)
        if agent.critic.is_recurrent:
            if hook.deferred is True:
                raise ValueError(
                    "deferred=True ValueComputation requires a feedforward critic"
                    " (recurrent critics use deferred='sequential')"
                )
            if hook.deferred == "sequential" and not getattr(agent.critic, "supports_next_token_eval", False):
                raise ValueError(
                    "deferred='sequential' requires a critic supporting next-token evaluation"
                )
            if hook.deferred == "sequential" and getattr(agent.sampler, "requires_per_step_memory", False):
                raise ValueError(
                    "deferred='sequential' records no per-step critic_memory snapshots, which "
                    "this sampler (requires_per_step_memory) needs for BPTT from arbitrary "
                    "offsets — use the per-step path (deferred=False)"
                )
            hook = hook.replace(memory=agent.critic.init_memory(agent.parallelism))
        elif hook.deferred == "sequential":
            hook = hook.replace(deferred=True)  # feedforward: batched deferral is strictly simpler
        return hook

    def post_act(self, state, transition):
        if self.deferred:
            return self, transition
        critic = state.critic
        observation = get_first(transition, "state", "observation")
        value, next_memory, _ = critic(observation, self.memory)
        transition["value"] = value
        if self.memory is not None:
            # BPTT needs only the rollout-INITIAL memory (consumers read
            # [0]); the scan driver truncates memory-suffixed stacks so the
            # update never gathers [T, N, ...] cache snapshots.
            transition["critic_memory"] = storable_memory(self.memory, observation.shape[0])
        return self.replace(memory=next_memory), transition

    def rollout_memory_entries(self):
        if self.memory is None or self.deferred is True:
            return {}
        # deferred="sequential" still records the rollout-initial memory: the
        # update's sequence-mode value-loss re-evaluation replays from it.
        return {"critic_memory": self.memory}

    def post_step(self, state, transition):
        if self.memory is None or self.deferred == "sequential":
            return self, transition
        from cusrl_tpu.nn.base import reset_memory

        # Recurrent critics: compute the bootstrap value for THIS step's
        # next-state here, with the post-act (pre-reset) memory — one extra
        # [N]-row critic step per env step.  This replaces the reference-style
        # whole-rollout [T*N] bootstrap pass AND the per-step
        # ``next_critic_memory`` cache stacks it consumed (on attention
        # backbones those stacks cost ~10 ms/iter of update-side gathers).
        next_obs = get_first(transition, "next_state", "next_observation")
        bootstrap_value, _, _ = state.critic(next_obs, self.memory)
        transition["bootstrap_value"] = bootstrap_value
        return self.replace(memory=reset_memory(self.memory, transition["done"])), transition

    def pre_update(self, state, rollout):
        critic = state.critic
        next_state = get_first(rollout, "next_state", "next_observation")
        terminated = rollout["terminated"]  # [T, N, 1] bool
        truncated = rollout["truncated"]

        if self.deferred == "sequential":
            from cusrl_tpu.nn.base import reset_memory

            observation = get_first(rollout, "state", "observation")
            done = rollout["done"]
            # Zeroing the LAST step's done leaves every query's masking
            # unchanged (a reset only affects later queries) but makes the
            # returned memory the pre-final-reset state — what the last-row
            # bootstrap evaluation needs.
            done_seq = done.at[-1].set(jnp.zeros_like(done[-1]))
            value, final_memory, ctx = critic.sequential_with_ctx(observation, self.memory, done_seq)
            if self.bootstrap_truncated_states:
                bootstrap = critic.eval_next_token(next_state, ctx)
                next_value = jnp.concatenate([value[1:], bootstrap[-1:]], axis=0)
                next_value = jnp.where(truncated, bootstrap, next_value)
            else:
                last_value, _, _ = critic(next_state[-1], final_memory)
                next_value = jnp.concatenate([value[1:], last_value[None]], axis=0)
                next_value = jnp.where(truncated, value, next_value)
            next_value = jnp.where(
                terminated, jnp.asarray(self.termination_value, next_value.dtype), next_value
            )
            new_memory = reset_memory(final_memory, done[-1])
            rollout = {**rollout, "value": value, "next_value": next_value}
            return self.replace(memory=new_memory), rollout, {}

        def eval_batched(states, memory):
            # Single-step critic over a [T, N, ...] stack folded into one batch.
            t, n = states.shape[:2]
            flat = states.reshape(t * n, *states.shape[2:])
            flat_memory = None if memory is None else jax.tree.map(
                lambda m: m.reshape(t * n, *m.shape[2:]), memory
            )
            v, _, _ = critic(flat, flat_memory)
            return v.reshape(t, n, -1)

        bootstrap = None
        sparse = None
        if self.deferred:
            observation = get_first(rollout, "state", "observation")
            if self.bootstrap_truncated_states:
                rollout = {**rollout, "value": eval_batched(observation, None)}
                if self.sparse_bootstrap:
                    sparse = self._compute_sparse_bootstrap(critic, next_state, truncated)
                else:
                    # Two T·N critic passes (obs, next_obs).  Concatenating
                    # into one 2·T·N pass forces a whole-rollout copy first
                    # (the scan emits time-minor layouts that the concat must
                    # normalize); separate passes read each stack in place and
                    # only pay one extra kernel pipeline ramp.
                    bootstrap = eval_batched(next_state, None)
            else:
                rollout = {**rollout, "value": eval_batched(observation, None)}
        value = rollout["value"]  # [T, N, Dr]

        last_value = None
        if self.bootstrap_truncated_states:
            if bootstrap is None and sparse is None:
                # Recurrent critics: per-step bootstrap values recorded in
                # post_step; legacy/feedforward non-deferred: one batched pass.
                bootstrap = rollout.get("bootstrap_value")
                if bootstrap is None:
                    bootstrap = eval_batched(next_state, rollout.get("next_critic_memory"))
        else:
            bootstrap = rollout.get("bootstrap_value")
            if bootstrap is not None:
                last_value = bootstrap[-1]
                bootstrap = None
            else:
                next_memory = rollout.get("next_critic_memory")
                last_memory = None if next_memory is None else jax.tree.map(lambda m: m[-1], next_memory)
                last_value, _, _ = critic(next_state[-1], last_memory)
                bootstrap = None

        # next_value[t] = value[t + 1]; last row bootstrapped from next_state.
        if sparse is not None:
            sparse_boot, last_vals = sparse
            next_value = jnp.concatenate([value[1:], last_vals[None]], axis=0)
            next_value = jnp.where(truncated, sparse_boot, next_value)
        elif bootstrap is None:
            next_value = jnp.concatenate([value[1:], last_value[None]], axis=0)
        else:
            next_value = jnp.concatenate([value[1:], bootstrap[-1:]], axis=0)
            next_value = jnp.where(truncated, bootstrap, next_value)
        if not self.bootstrap_truncated_states:
            next_value = jnp.where(truncated, value, next_value)
        next_value = jnp.where(terminated, jnp.asarray(self.termination_value, next_value.dtype), next_value)

        rollout = {**rollout, "next_value": next_value}
        return self, rollout, {}

    @staticmethod
    def _compute_sparse_bootstrap(critic, next_state, truncated):
        """Bootstrap values via a capacity-N gather of truncated rows (plus the
        final step), with an in-jit fallback to the full pass on overflow.

        Per-row math is identical to the full pass: the critic is a pure
        per-row function, so evaluating the gathered subset produces the same
        values the full [T*N] evaluation would at those rows."""
        t, n = next_state.shape[:2]
        flat_states = next_state.reshape(t * n, *next_state.shape[2:])
        flat_trunc = truncated.reshape(t * n)
        capacity = n
        idx = jnp.nonzero(flat_trunc, size=capacity, fill_value=t * n)[0]
        overflow = jnp.sum(flat_trunc) > capacity
        rows = flat_states[jnp.minimum(idx, t * n - 1)]
        vals, _, _ = critic(rows)  # [capacity, Dr]
        dr = vals.shape[-1]

        def sparse_path(_):
            boot = jnp.zeros((t * n, dr), vals.dtype).at[idx].set(vals, mode="drop")
            return boot.reshape(t, n, dr)

        def full_path(_):
            v, _, _ = critic(flat_states)
            return v.reshape(t, n, dr)

        boot = jax.lax.cond(overflow, full_path, sparse_path, None)
        last_vals, _, _ = critic(next_state[-1])
        return boot, last_vals


def _clipped_value_loss(value, curr_value, returns, loss_clip):
    clipped = value + jnp.clip(curr_value - value, -loss_clip, loss_clip)
    return jnp.maximum(jnp.square(curr_value - returns), jnp.square(clipped - returns)).mean()


class ValueLoss(Hook):
    """MSE or PPO-clipped value regression toward computed returns."""

    weight: float = mutable_field(default=0.5)
    loss_clip: float | None = static_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    def __post_init__(self):
        validate_concrete(lambda w: w > 0, self.weight, "'weight' must be positive")
        validate_concrete(lambda c: c > 0, self.loss_clip, "'loss_clip' must be positive or None")

    def objective(self, state, metadata, batch):
        critic = state.critic
        if "curr_value" in batch:
            # Precomputed by JointPolicyValueEvaluation (stacked actor+critic pass).
            curr_value = batch["curr_value"]
        else:
            observation = get_first(batch, "state", "observation")
            memory = batch.get("critic_memory")
            if metadata.get("temporal") and memory is not None:
                memory = jax.tree.map(lambda m: m[0], memory)
            curr_value, _, _ = critic(
                observation, memory, sequential=metadata.get("temporal", False), done=batch.get("done")
            )
            batch["curr_value"] = curr_value

        value = batch["value"]
        returns = batch["return"]
        if self.loss_clip is None:
            loss = jnp.square(curr_value - returns).mean()
        else:
            loss = _clipped_value_loss(value, curr_value, returns, self.loss_clip)
        metrics = {"value": jax.lax.stop_gradient(curr_value.sum(-1).mean())}
        return self, batch, {"value_loss": loss * self.weight}, metrics
