"""Running mean/std normalizer as an immutable pytree (counterpart of
cusrl/nn/layer/rms.py:14-246).

Functional semantics: ``rms.update(batch)`` returns a NEW RunningMeanStd — the
caller threads it through the train state, so updates compose inside jit and
lax.scan.  Channel groups share statistics, excluded indices pass through
unnormalized, and counts can be capped (``max_count``) to keep adapting.

Distributed behavior: there is no explicit synchronization path.  Updates run
inside the jitted step on the globally-sharded batch, so batch statistics are
global by construction (see nn/utils/normalization.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, frozen_field, static_field
from cusrl_tpu.nn.utils.normalization import mean_var_count, merge_mean_var

__all__ = ["RunningMeanStd"]


def _as_index_tuple(indices) -> tuple[int, ...]:
    if indices is None:
        return ()
    if isinstance(indices, slice):
        raise TypeError("Pass explicit index tuples, not slices (static-shape friendly).")
    if isinstance(indices, int):
        return (indices,)
    return tuple(int(i) for i in indices)


class RunningMeanStd(Module):
    mean: jax.Array = frozen_field()
    var: jax.Array = frozen_field()
    count: jax.Array = frozen_field()
    groups: tuple[tuple[int, ...], ...] = static_field(default=())
    excluded_indices: tuple[int, ...] = static_field(default=())
    clamp: float | None = static_field(default=10.0)
    max_count: float | None = static_field(default=None)
    epsilon: float = static_field(default=1e-8)

    @staticmethod
    def init(
        num_channels: int,
        *,
        groups=(),
        excluded_indices=None,
        clamp: float | None = 10.0,
        max_count: float | None = None,
        epsilon: float = 1e-8,
    ) -> "RunningMeanStd":
        if clamp is not None and clamp <= 0:
            raise ValueError("'clamp' must be None or positive")
        if max_count is not None and max_count <= 0:
            raise ValueError("'max_count' must be None or positive")
        groups = tuple(_as_index_tuple(g) for g in groups)
        excluded = _as_index_tuple(excluded_indices)
        seen: set[int] = set()
        for g in groups:
            if seen & set(g):
                raise ValueError("Indices in 'groups' must not overlap")
            seen |= set(g)
        if seen & set(excluded):
            raise ValueError("'excluded_indices' must not overlap with 'groups'")
        return RunningMeanStd(
            mean=jnp.zeros(num_channels, jnp.float32),
            var=jnp.ones(num_channels, jnp.float32),
            count=jnp.zeros((), jnp.float32),
            groups=groups,
            excluded_indices=excluded,
            clamp=clamp,
            max_count=max_count,
            epsilon=epsilon,
        )

    @property
    def num_channels(self) -> int:
        return self.mean.shape[0]

    @property
    def std(self) -> jax.Array:
        return jnp.sqrt(self.var + self.epsilon)

    def normalize(self, x: jax.Array) -> jax.Array:
        y = (x.astype(jnp.float32) - self.mean) / self.std
        if self.clamp is not None:
            y = jnp.clip(y, -self.clamp, self.clamp)
        return y.astype(x.dtype)

    __call__ = normalize

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return (x.astype(jnp.float32) * self.std + self.mean).astype(x.dtype)

    def _process_batch_stats(self, batch_mean: jax.Array, batch_var: jax.Array):
        if self.excluded_indices:
            idx = jnp.asarray(self.excluded_indices)
            batch_mean = batch_mean.at[idx].set(0.0)
            batch_var = batch_var.at[idx].set(1.0)
        for group in self.groups:
            idx = jnp.asarray(group)
            g_mean = jnp.mean(batch_mean[idx])
            g_sq_mean = jnp.mean(jnp.square(batch_mean[idx]))
            g_var = jnp.mean(batch_var[idx]) - jnp.square(g_mean) + g_sq_mean
            batch_mean = batch_mean.at[idx].set(g_mean)
            batch_var = batch_var.at[idx].set(g_var)
        return batch_mean, batch_var

    def update(self, x: jax.Array, *, uncentered: bool = False, mask: jax.Array | None = None) -> "RunningMeanStd":
        return self.update_from_stats(*mean_var_count(x, uncentered=uncentered, mask=mask))

    def update_from_stats(self, batch_mean, batch_var, batch_count) -> "RunningMeanStd":
        batch_count = jnp.asarray(batch_count, jnp.float32)
        batch_mean, batch_var = self._process_batch_stats(
            jnp.asarray(batch_mean, jnp.float32), jnp.asarray(batch_var, jnp.float32)
        )
        mean, var, count = merge_mean_var(self.mean, self.var, self.count, batch_mean, batch_var, batch_count)
        # Empty batch leaves the state untouched (jit-safe select).
        empty = batch_count == 0
        mean = jnp.where(empty, self.mean, mean)
        var = jnp.where(empty, self.var, var)
        count = jnp.where(empty, self.count, count)
        if self.max_count is not None:
            count = jnp.minimum(count, self.max_count)
        return self.replace(mean=mean, var=var, count=count)

    def clear(self) -> "RunningMeanStd":
        return self.replace(
            mean=jnp.zeros_like(self.mean), var=jnp.ones_like(self.var), count=jnp.zeros_like(self.count)
        )
