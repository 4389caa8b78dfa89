"""Random samplers (counterpart of cusrl/sampler/random_sampler.py:18-138).

``RandomSampler`` draws independent uniform transitions; ``TemporalRandomSampler``
draws random ``(env, start)`` windows of fixed length.  Index plans are generated
on device and consumed by the jitted update scan like the mini-batch samplers.

Deviation: plans are generated over the full ``[T, N]`` rollout (the on-policy
update path always runs on a full buffer); the reference's partially-filled
ring-buffer logical-time mapping applies to off-policy-style host use and is
handled by Buffer cursor bookkeeping there.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["AutoRandomSampler", "RandomSampler", "TemporalRandomSampler"]


@dataclasses.dataclass
class RandomSampler:
    num_batches: int = 1
    batch_size: int = 256

    def make_plan(self, key: jax.Array, capacity: int, parallelism: int, rollout: dict):
        total = capacity * parallelism
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

    def make_plan(self, key: jax.Array, capacity: int, parallelism: int, rollout: dict):
        length = capacity if self.sequence_len is None else min(self.sequence_len, capacity)
        env_key, start_key = jax.random.split(key)
        env_indices = jax.random.randint(env_key, (self.num_batches, self.batch_size), 0, parallelism)
        starts = jax.random.randint(start_key, (self.num_batches, self.batch_size), 0, capacity - length + 1)
        offsets = jnp.arange(length)[None, :, None]  # [1, L, 1]
        time_indices = starts[:, None, :] + offsets  # [K, L, B]
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

    def _resolve(self, rollout: dict):
        from cusrl_tpu.utils.nest import flatten_nested

        is_temporal = any(key.split(".")[0].endswith("memory") for key in flatten_nested(rollout))
        if is_temporal:
            return TemporalRandomSampler(self.num_batches, self.batch_size, self.sequence_len)
        return RandomSampler(self.num_batches, self.batch_size)

    def make_plan(self, key, capacity, parallelism, rollout):
        self._resolved = self._resolve(rollout)
        return self._resolved.make_plan(key, capacity, parallelism, rollout)

    def gather(self, rollout, idx):
        return self._resolved.gather(rollout, idx)
