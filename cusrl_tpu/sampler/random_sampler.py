"""Random samplers (counterpart of cusrl/sampler/random_sampler.py:18-138).

``RandomSampler`` draws independent uniform transitions; ``TemporalRandomSampler``
draws random ``(env, start)`` windows of fixed length.  Index plans are generated
on device and consumed by the jitted update scan like the mini-batch samplers.

Partially-filled / ring-buffer support (reference semantics,
cusrl/sampler/random_sampler.py:47-76): the agent threads a traced
``buffer_state = {"cursor", "full"}`` into ``make_plan``.  The valid extent
``capacity if full else cursor`` becomes a TRACED bound for the uniform draws
(shapes stay static — XLA-friendly), and temporal windows sample start
positions in LOGICAL time, mapped to physical ring positions with
``(cursor + t) % capacity`` when the buffer has wrapped.  Without a
``buffer_state`` the plans cover the full ``[T, N]`` rollout (the on-policy
path always updates on a full buffer).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["AutoRandomSampler", "RandomSampler", "TemporalRandomSampler"]


def _valid_steps(capacity: int, buffer_state: dict | None):
    """Traced number of valid steps: capacity when full, else the cursor."""
    if buffer_state is None:
        return None  # statically full
    return jnp.where(
        jnp.asarray(buffer_state["full"], jnp.bool_),
        jnp.asarray(capacity, jnp.int32),
        jnp.asarray(buffer_state["cursor"], jnp.int32),
    )


@dataclasses.dataclass
class RandomSampler:
    num_batches: int = 1
    batch_size: int = 256

    def make_plan(self, key: jax.Array, capacity: int, parallelism: int, rollout: dict, buffer_state=None):
        valid = _valid_steps(capacity, buffer_state)
        total = capacity * parallelism if valid is None else valid * parallelism
        # randint accepts traced bounds: uniform over the VALID flat region
        # [0, valid*N) — rows [0:cursor] of a filling buffer are exactly the
        # contiguous leading rows of the flattened [T*N] layout.
        indices = jax.random.randint(key, (self.num_batches, self.batch_size), 0, total)
        static_meta = {"total_batches": self.num_batches, "temporal": False}
        meta_arrays = {"batch_index": jnp.arange(self.num_batches)}
        return static_meta, meta_arrays, indices

    def gather(self, rollout: dict, idx: jax.Array) -> dict:
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[idx], rollout)


@dataclasses.dataclass
class TemporalRandomSampler:
    num_batches: int = 1
    batch_size: int = 64
    sequence_len: int | None = None
    # Windows start at arbitrary steps, so BPTT needs the memory snapshot AT
    # each window start — the scan driver must keep full [T, N, ...] memory
    # stacks for this sampler (it truncates them to [1, ...] otherwise).
    requires_per_step_memory = True

    def make_plan(self, key: jax.Array, capacity: int, parallelism: int, rollout: dict, buffer_state=None):
        # Sequence length must be static (XLA shapes); ``None`` means the full
        # buffer capacity, which requires a full buffer.
        length = capacity if self.sequence_len is None else min(self.sequence_len, capacity)
        env_key, start_key = jax.random.split(key)
        env_indices = jax.random.randint(env_key, (self.num_batches, self.batch_size), 0, parallelism)
        valid = _valid_steps(capacity, buffer_state)
        if valid is None:
            num_starts = capacity - length + 1
            starts = jax.random.randint(start_key, (self.num_batches, self.batch_size), 0, num_starts)
            offsets = jnp.arange(length)[None, :, None]  # [1, L, 1]
            time_indices = starts[:, None, :] + offsets  # [K, L, B]
        else:
            # Logical-time starts over the valid extent; map back to physical
            # ring positions when the buffer has wrapped (cursor = oldest step).
            num_starts = jnp.maximum(valid - length + 1, 1)
            starts = jax.random.randint(start_key, (self.num_batches, self.batch_size), 0, num_starts)
            offsets = jnp.arange(length)[None, :, None]
            logical = starts[:, None, :] + offsets
            cursor = jnp.asarray(buffer_state["cursor"], jnp.int32)
            full = jnp.asarray(buffer_state["full"], jnp.bool_)
            time_indices = jnp.where(full, (cursor + logical) % capacity, logical)
        static_meta = {"total_batches": self.num_batches, "temporal": True}
        meta_arrays = {"batch_index": jnp.arange(self.num_batches)}
        return static_meta, meta_arrays, (time_indices, env_indices)

    def gather(self, rollout: dict, idx) -> dict:
        time_indices, env_indices = idx  # [L, B], [B]
        return jax.tree.map(lambda x: x[time_indices, env_indices[None, :]], rollout)


@dataclasses.dataclass
class AutoRandomSampler:
    num_batches: int = 1
    batch_size: int = 256
    sequence_len: int | None = None
    requires_per_step_memory = True  # may resolve to TemporalRandomSampler

    def _resolve(self, rollout: dict):
        from cusrl_tpu.utils.nest import flatten_nested

        is_temporal = any(key.split(".")[0].endswith("memory") for key in flatten_nested(rollout))
        if is_temporal:
            return TemporalRandomSampler(self.num_batches, self.batch_size, self.sequence_len)
        return RandomSampler(self.num_batches, self.batch_size)

    def make_plan(self, key, capacity, parallelism, rollout, buffer_state=None):
        self._resolved = self._resolve(rollout)
        return self._resolved.make_plan(key, capacity, parallelism, rollout, buffer_state)

    def gather(self, rollout, idx):
        return self._resolved.gather(rollout, idx)
