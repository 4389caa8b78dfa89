"""Observation/state online normalization (counterpart of
cusrl/hook/mdp/observation.py:17-255).

Statistics update policy replicates the reference exactly:
* ``post_step`` folds every ``next_observation``/``next_state`` into the RMS;
* ``pre_act`` additionally folds only the *reset* rows (mask = last step's done),
  because those fresh-episode observations never appear as anyone's next_obs —
  unless the env reports ``final_state_is_missing`` (then next_obs already IS the
  reset obs and pre_act adds nothing).

The reference's deferred distributed synchronization machinery
(observation.py:227-234) is unnecessary here: updates run inside jit over the
globally-sharded batch, so statistics are global by construction.
``defer_synchronization`` is accepted for API compatibility and ignored.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import frozen_field, mutable_field, static_field
from cusrl_tpu.nn.layer.rms import RunningMeanStd
from cusrl_tpu.nn.utils.normalization import mean_var_count
from cusrl_tpu.template.hook import Hook

__all__ = ["ObservationNanToNum", "ObservationNormalization"]


def _zero_acc(dim: int):
    return (jnp.zeros(dim, jnp.float32), jnp.zeros(dim, jnp.float32), jnp.zeros((), jnp.float32))


def _accumulate(acc, data, mask):
    data = data.astype(jnp.float32).reshape(-1, data.shape[-1])
    total, sumsq, count = acc
    if mask is not None:
        w = mask.astype(jnp.float32).reshape(-1, 1)
        return (total + jnp.sum(data * w, 0), sumsq + jnp.sum(jnp.square(data) * w, 0), count + jnp.sum(w))
    return (total + jnp.sum(data, 0), sumsq + jnp.sum(jnp.square(data), 0), count + jnp.asarray(data.shape[0], jnp.float32))


def _finalize_acc(acc):
    total, sumsq, count = acc
    safe = jnp.maximum(count, 1.0)
    mean = total / safe
    var = jnp.maximum(sumsq / safe - jnp.square(mean), 0.0)
    return mean, var, count


class ObservationNanToNum(Hook):
    """Replaces NaN/Inf in observations and states with finite values
    (cusrl/hook/mdp/observation.py:17-56)."""

    nan: float = mutable_field(default=0.0)
    posinf: float | None = mutable_field(default=None)
    neginf: float | None = mutable_field(default=None)

    def _clean(self, x):
        return jnp.nan_to_num(x, nan=self.nan, posinf=self.posinf, neginf=self.neginf)

    def pre_act(self, state, transition):
        transition["observation"] = self._clean(transition["observation"])
        if transition.get("state") is not None:
            transition["state"] = self._clean(transition["state"])
        return self, transition

    def post_step(self, state, transition):
        transition["next_observation"] = self._clean(transition["next_observation"])
        if transition.get("next_state") is not None:
            transition["next_state"] = self._clean(transition["next_state"])
        return self, transition


class ObservationNormalization(Hook):
    max_count: float | None = static_field(default=None)
    defer_synchronization: bool = static_field(default=False)  # accepted; no-op on TPU
    renormalize: bool = static_field(default=False)
    # TPU perf knob: instead of the ~10-kernel Chan merge twice per rollout
    # step, accumulate raw (sum, sumsq, count) per step and fold them into the
    # RunningMeanStd ONCE per rollout (pre_update).  Normalization during the
    # rollout then uses statistics that lag by at most one rollout — usually
    # indistinguishable.  Off by default to match reference semantics.
    defer_updates: bool = static_field(default=False)
    # Keep raw values as original_* transition fields (reference always does;
    # disable to shrink the rollout buffer when nothing consumes them).
    store_originals: bool = static_field(default=True)
    frozen: bool = static_field(default=False, kw_only=True)

    observation_rms: RunningMeanStd | None = frozen_field(default=None)
    state_rms: RunningMeanStd | None = frozen_field(default=None)
    # Deferred-update accumulators: (sum[C], sumsq[C], count[]) per stream.
    obs_acc: tuple | None = frozen_field(default=None)
    state_acc: tuple | None = frozen_field(default=None)
    # Fixed-structure carry state (scan-compatible): last step's done mask and a
    # first-call flag replacing the reference's None-checks.
    last_done: jax.Array | None = frozen_field(default=None)
    first_step: jax.Array | None = frozen_field(default=None)

    mirror_observation: Callable | None = static_field(default=None, kw_only=True)
    mirror_state: Callable | None = static_field(default=None, kw_only=True)
    subset_indices: tuple[int, ...] | None = static_field(default=None, kw_only=True)
    final_state_is_missing: bool = static_field(default=False, kw_only=True)

    def freeze(self) -> "ObservationNormalization":
        return self.replace(frozen=True)

    def set_inference_mode(self, inference: bool) -> "ObservationNormalization":
        return self.replace(frozen=self.frozen or inference)

    # -- init ------------------------------------------------------------------

    def init(self, agent, key):
        spec = agent.environment_spec
        subset = spec.observation_is_subset_of_state
        if subset is not None:
            if not spec.has_state:
                raise ValueError("'observation_is_subset_of_state' set without a state")
            subset = tuple(int(i) for i in jnp.atleast_1d(jnp.asarray(subset)).tolist())
            observation_rms = RunningMeanStd.init(spec.observation_dim)
        else:
            observation_rms = RunningMeanStd.init(
                spec.observation_dim,
                max_count=self.max_count,
                groups=spec.observation_stat_groups,
                excluded_indices=spec.observation_normalization_excluded_indices,
            )
        state_rms = None
        if spec.has_state:
            state_rms = RunningMeanStd.init(
                spec.state_dim,
                max_count=self.max_count,
                groups=spec.state_stat_groups,
                excluded_indices=spec.state_normalization_excluded_indices,
            )
        n = spec.num_instances
        obs_acc = state_acc = None
        if self.defer_updates:
            obs_acc = _zero_acc(spec.observation_dim)
            if spec.has_state:
                state_acc = _zero_acc(spec.state_dim)
        return self.replace(
            obs_acc=obs_acc,
            state_acc=state_acc,
            observation_rms=observation_rms,
            state_rms=state_rms,
            mirror_observation=spec.mirror_observation,
            mirror_state=spec.mirror_state,
            subset_indices=subset,
            final_state_is_missing=spec.final_state_is_missing,
            last_done=jnp.zeros((n, 1), bool),
            first_step=jnp.ones((), bool),
        )

    # -- statistics updates ----------------------------------------------------

    def _update_one(self, rms: RunningMeanStd, data, mirror, mask) -> RunningMeanStd:
        mean, var, count = mean_var_count(data, mask=mask)
        if mirror is not None:
            m_mean = mirror(mean)
            m_var = jnp.abs(mirror(var))
            var = (var + m_var) / 2 + jnp.square(mean - m_mean) / 4
            mean = (mean + m_mean) / 2
        return rms.update_from_stats(mean, var, count)

    def _update(self, observation, state, mask) -> "ObservationNormalization":
        if self.frozen:
            return self
        if self.defer_updates:
            new = self.replace(obs_acc=_accumulate(self.obs_acc, observation, mask))
            if state is not None and new.state_acc is not None:
                new = new.replace(state_acc=_accumulate(new.state_acc, state, mask))
            return new
        new = self
        if state is not None and new.state_rms is not None:
            new = new.replace(state_rms=new._update_one(new.state_rms, state, new.mirror_state, mask))
        if new.subset_indices is not None:
            new = new._copy_subset_stats()
        else:
            new = new.replace(
                observation_rms=new._update_one(new.observation_rms, observation, new.mirror_observation, mask)
            )
        return new

    def _copy_subset_stats(self) -> "ObservationNormalization":
        idx = jnp.asarray(self.subset_indices)
        obs_rms = self.observation_rms.replace(
            mean=self.state_rms.mean[idx], var=self.state_rms.var[idx], count=self.state_rms.count
        )
        return self.replace(observation_rms=obs_rms)

    # -- traced lifecycle ------------------------------------------------------

    def pre_act(self, state, transition):
        observation = transition["observation"]
        env_state = transition.get("state")
        new = self
        first = self.first_step if self.first_step is not None else jnp.ones((), bool)
        done = self.last_done if self.last_done is not None else jnp.zeros((*observation.shape[:-1], 1), bool)
        if not self.final_state_is_missing:
            # Fold in the fresh reset rows (mask = previous done; all rows on the
            # very first call — those observations never appear as next_obs).
            mask = jnp.logical_or(first, done.reshape(observation.shape[:-1]))
        else:
            # next_obs already covers reset rows; only the very first call counts.
            mask = jnp.logical_and(first, jnp.ones(observation.shape[:-1], bool))
        new = new._update(observation, env_state, mask)
        new = new.replace(first_step=jnp.zeros((), bool))

        if self.store_originals:
            transition["original_observation"] = observation
        transition["observation"] = new.observation_rms.normalize(observation)
        if new.state_rms is not None and env_state is not None:
            if self.store_originals:
                transition["original_state"] = env_state
            transition["state"] = new.state_rms.normalize(env_state)
        return new, transition

    def post_step(self, state, transition):
        next_observation = transition["next_observation"]
        next_state = transition.get("next_state")
        new = self._update(next_observation, next_state, None)
        new = new.replace(last_done=transition["done"])

        if self.store_originals:
            transition["original_next_observation"] = next_observation
        transition["next_observation"] = new.observation_rms.normalize(next_observation)
        if new.state_rms is not None and next_state is not None:
            if self.store_originals:
                transition["original_next_state"] = next_state
            transition["next_state"] = new.state_rms.normalize(next_state)
        return new, transition

    def pre_update(self, state, rollout):
        if not self.defer_updates or self.frozen:
            return self, rollout, {}
        # Fold the rollout's accumulated raw statistics into the RMS once.
        new = self
        mean, var, count = _finalize_acc(self.obs_acc)
        if new.subset_indices is None:
            obs_rms = new._mirror_merge(new.observation_rms, mean, var, count, new.mirror_observation)
            new = new.replace(observation_rms=obs_rms)
        if new.state_acc is not None and new.state_rms is not None:
            s_mean, s_var, s_count = _finalize_acc(new.state_acc)
            state_rms = new._mirror_merge(new.state_rms, s_mean, s_var, s_count, new.mirror_state)
            new = new.replace(state_rms=state_rms)
        if new.subset_indices is not None:
            new = new._copy_subset_stats()
        new = new.replace(
            obs_acc=_zero_acc(new.observation_rms.num_channels),
            state_acc=None if new.state_acc is None else _zero_acc(new.state_rms.num_channels),
        )
        return new, rollout, {}

    def _mirror_merge(self, rms, mean, var, count, mirror):
        if mirror is not None:
            m_mean = mirror(mean)
            m_var = jnp.abs(mirror(var))
            var = (var + m_var) / 2 + jnp.square(mean - m_mean) / 4
            mean = (mean + m_mean) / 2
        return rms.update_from_stats(mean, var, count)

    def objective(self, state: Any, metadata, batch):
        if self.renormalize:
            batch["observation"] = self.observation_rms.normalize(batch["original_observation"])
            batch["next_observation"] = self.observation_rms.normalize(batch["original_next_observation"])
            if self.state_rms is not None and "original_state" in batch:
                batch["state"] = self.state_rms.normalize(batch["original_state"])
                batch["next_state"] = self.state_rms.normalize(batch["original_next_state"])
        return self, batch, None, {}

    def pre_export(self, agent, graph) -> None:
        graph.add_normalization("observation_rms", self.observation_rms, input_name="observation")
