"""Mini-batch samplers (counterpart of cusrl/sampler/mini_batch_sampler.py:12-140).

TPU-native design: a sampler produces an *index plan* — static metadata plus
stacked per-batch index arrays — that the agent's jitted update consumes with a
single ``lax.scan``; gathering happens on device with zero host round-trips.

``MiniBatchSampler``        shuffled transitions over the flattened ``[T*N]`` axis.
``TemporalMiniBatchSampler`` shuffled whole sequences (columns ``[:, idx]``) for BPTT.
``AutoMiniBatchSampler``     dispatches on whether any rollout key ends in "memory".

Deviation from the reference: per-epoch varying mini-batch counts (a sequence for
``num_mini_batches``) are not supported — XLA wants one static batch shape; the
remainder ``total % num_mini_batches`` transitions are dropped per epoch (the
reference drops them too when the division is uneven).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["AutoMiniBatchSampler", "MiniBatchSampler", "TemporalMiniBatchSampler"]


@dataclasses.dataclass
class MiniBatchSampler:
    num_epochs: int = 1
    num_mini_batches: int = 1
    shuffle: bool = True
    # Shuffle granularity for the epoch plan.  "auto" permutes 128-row tiles
    # when the rollout divides evenly (contiguous 128-row blocks are one DMA
    # on TPU; random single-row gathers of the full rollout measured 12.5 ms
    # per iteration at the benchmark config — more than the whole backbone
    # fwd+bwd).  A minibatch gradient depends only on the SET of rows in the
    # batch, so a uniformly-permuted tile partition is an equally valid SGD
    # partition: each epoch still covers every transition exactly once and
    # tile-mates are same-timestep transitions of independent environments.
    # Set 1 to force the reference's row-granular permutation.
    shuffle_block_size: int | str = "auto"

    def __post_init__(self):
        if self.num_epochs <= 0:
            raise ValueError("'num_epochs' must be positive")
        if self.num_mini_batches <= 0:
            raise ValueError("'num_mini_batches' must be positive")

    def _resolve_block(self, total: int, batch_size: int) -> int:
        block = self.shuffle_block_size
        if block == "auto":
            block = 128
            if total % block != 0 or batch_size % block != 0 or total // block < self.num_mini_batches:
                return 1
            return block
        block = int(block)
        if block > 1 and (total % block != 0 or batch_size % block != 0):
            raise ValueError(
                f"shuffle_block_size={block} must divide both the rollout ({total}) and the "
                f"mini-batch size ({batch_size})"
            )
        return max(block, 1)

    # -- plan ------------------------------------------------------------------

    def _num_samples(self, capacity: int, parallelism: int) -> int:
        return capacity * parallelism

    def _temporal(self) -> bool:
        return False

    def make_plan(self, key: jax.Array, capacity: int, parallelism: int, rollout: dict):
        num_samples = self._num_samples(capacity, parallelism)
        if self.num_mini_batches > num_samples:
            raise ValueError(f"'num_mini_batches' ({self.num_mini_batches}) exceeds sample count ({num_samples})")
        batch_size = num_samples // self.num_mini_batches

        def epoch_indices(epoch_key):
            if self.shuffle:
                perm = jax.random.permutation(epoch_key, num_samples)
            else:
                perm = jnp.arange(num_samples)
            return perm[: self.num_mini_batches * batch_size].reshape(self.num_mini_batches, batch_size)

        keys = jax.random.split(key, self.num_epochs)
        indices = jnp.concatenate([epoch_indices(k) for k in keys], axis=0)  # [E*M, B]
        epoch_index = jnp.repeat(jnp.arange(self.num_epochs), self.num_mini_batches)
        mini_batch_index = jnp.tile(jnp.arange(self.num_mini_batches), self.num_epochs)
        static_meta = {
            "total_epochs": self.num_epochs,
            "total_mini_batches": self.num_mini_batches,
            "temporal": self._temporal(),
        }
        meta_arrays = {"epoch_index": epoch_index, "mini_batch_index": mini_batch_index}
        return static_meta, meta_arrays, indices

    # -- gather ----------------------------------------------------------------

    def gather(self, rollout: dict, idx: jax.Array) -> dict:
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:])[idx], rollout)

    # -- epoch plan (TPU fast path) -------------------------------------------
    #
    # Random-index gathers are expensive on TPU (uncoalesced HBM access).  The
    # epoch plan shuffles the flattened rollout ONCE per epoch (one gather) and
    # then takes minibatches as contiguous dynamic slices (free).  Statistically
    # identical to per-minibatch gathers from a per-epoch permutation.

    def make_epoch_plan(self, key: jax.Array, capacity: int, parallelism: int, rollout: dict):
        """Returns (static_meta, epoch_perms [E, total], batch_size) or None if
        this sampler variant has no slice-friendly plan."""
        if self._temporal():
            return None
        total = capacity * parallelism
        batch_size = total // self.num_mini_batches
        block = self._resolve_block(total, batch_size)
        num_units = total // block if block > 1 else total
        if self.shuffle:
            perms = jnp.stack([jax.random.permutation(k, num_units) for k in jax.random.split(key, self.num_epochs)])
        else:
            perms = jnp.tile(jnp.arange(num_units), (self.num_epochs, 1))
        static_meta = {
            "total_epochs": self.num_epochs,
            "total_mini_batches": self.num_mini_batches,
            "temporal": False,
            "shuffle_block": block,
        }
        return static_meta, perms, batch_size


@dataclasses.dataclass
class TemporalMiniBatchSampler(MiniBatchSampler):
    def _num_samples(self, capacity: int, parallelism: int) -> int:
        return parallelism

    def _temporal(self) -> bool:
        return True

    def gather(self, rollout: dict, idx: jax.Array) -> dict:
        return jax.tree.map(lambda x: x[:, idx], rollout)


@dataclasses.dataclass
class AutoMiniBatchSampler(MiniBatchSampler):
    """Temporal iff the rollout carries recurrent memory (a trace-time fact)."""

    def _resolve(self, rollout: dict) -> MiniBatchSampler:
        from cusrl_tpu.utils.nest import flatten_nested

        is_temporal = any(key.split(".")[0].endswith("memory") for key in flatten_nested(rollout))
        cls = TemporalMiniBatchSampler if is_temporal else MiniBatchSampler
        return cls(self.num_epochs, self.num_mini_batches, self.shuffle, self.shuffle_block_size)

    def make_plan(self, key, capacity, parallelism, rollout):
        self._resolved = self._resolve(rollout)
        return self._resolved.make_plan(key, capacity, parallelism, rollout)

    def make_epoch_plan(self, key, capacity, parallelism, rollout):
        self._resolved = self._resolve(rollout)
        return self._resolved.make_epoch_plan(key, capacity, parallelism, rollout)

    def gather(self, rollout, idx):
        return self._resolved.gather(rollout, idx)
