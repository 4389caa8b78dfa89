"""Rollout buffer (counterpart of cusrl/template/buffer.py:16-207).

Host-side façade over device-resident storage: a dict of ``[capacity, parallelism,
...]`` arrays living in HBM.  Two write paths:

* **Host loop** (Gym-style envs): ``push()`` queues each step host-side
  (write-behind) and flushes to ``[capacity, N, ...]`` storage in one stacked
  write when read — per-step jitted writes cost ~1.4 ms of dispatch each.
* **Scan rollout** (JAX envs): the jitted rollout produces the whole ``[T, N,...]``
  stack at once and ``replace_data()`` swaps it in — zero per-step dispatch.

The cursor/full flags are host ints (the rollout loop is synchronous), which keeps
allocation lazy and indices static-friendly.  ``data`` (a pytree) is what hooks
receive inside the jitted update.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping, MutableMapping
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.utils import nest

__all__ = ["Buffer", "Sampler"]


@partial(jax.jit, donate_argnums=(0,))
def _write_step(storage: dict, values: dict, cursor: jax.Array) -> dict:
    return jax.tree.map(lambda buf, val: jax.lax.dynamic_update_index_in_dim(buf, val, cursor, 0), storage, values)


class Buffer(MutableMapping):
    def __init__(self, capacity: int, parallelism: int):
        self.capacity = int(capacity)
        self.parallelism = int(parallelism)
        self.cursor = 0
        self.full = False
        self.schema: dict[str, Any] = {}
        self.storage: dict[str, jax.Array] = {}
        self._pending: list[tuple[int, dict[str, jax.Array]]] = []

    # -- mapping interface over top-level field names -------------------------

    def __iter__(self) -> Iterator[str]:
        yield from self.schema

    def __len__(self) -> int:
        return len(self.schema)

    def __contains__(self, key) -> bool:
        return key in self.schema

    def __getitem__(self, key: str):
        self._flush()
        return nest.reconstruct_nested(self.storage, self.schema[key])

    def __setitem__(self, name: str, data) -> None:
        if data is None:
            return
        self._check_schema(name, data)
        for key, value in nest.iterate_nested(data, prefix=name):
            value = jnp.asarray(value)
            if value.shape[:2] != (self.capacity, self.parallelism):
                raise ValueError(
                    f"Field '{key}' must have shape [capacity={self.capacity}, "
                    f"parallelism={self.parallelism}, ...]; got {value.shape}"
                )
            self.storage[key] = value

    def __delitem__(self, name: str) -> None:
        if name not in self.schema:
            raise KeyError(name)
        for _, key in nest.iterate_nested(self.schema[name]):
            del self.storage[key]
        del self.schema[name]

    def get(self, key: str, default=None):
        if key not in self.schema:
            return default
        return self[key]

    # -- lifecycle ------------------------------------------------------------

    def clear(self) -> None:
        self.cursor = 0
        self.full = False
        self.schema.clear()
        self.storage.clear()
        self._pending.clear()

    def reset_cursor(self) -> None:
        self.cursor = 0

    def resize(self, capacity: int) -> None:
        if capacity != self.capacity:
            self.clear()
            self.capacity = int(capacity)

    @property
    def num_valid_steps(self) -> int:
        return self.capacity if self.full else self.cursor

    # -- write paths ----------------------------------------------------------

    def push(self, transition: Mapping[str, Any]) -> None:
        """Appends one step; leaves must have shape ``[parallelism, ...]``.

        Write-behind: the step is queued host-side (a dict of device arrays —
        O(1), no dispatch) and flushed into the ``[capacity, N, ...]`` storage
        in one stacked write when the data is read.  A per-step jitted
        dynamic-update costs ~1.4 ms of dispatch on the host-loop path —
        dominating gym-style training (profiled in round 2)."""
        values: dict[str, jax.Array] = {}
        for name, nested in transition.items():
            if nested is None:
                continue
            self._check_schema(name, nested)
            for key, value in nest.iterate_nested(nested, prefix=name):
                value = jnp.asarray(value)
                if value.ndim < 1 or value.shape[0] != self.parallelism:
                    raise ValueError(
                        f"A step of '{key}' must have shape [parallelism={self.parallelism}, ...];"
                        f" got {value.shape}"
                    )
                values[key] = value
        if values:
            self._pending.append((self.cursor, values))
        self.cursor += 1
        if self.cursor == self.capacity:
            self.full = True
            self.cursor = 0

    def _flush(self) -> None:
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        contiguous = (
            len(pending) == self.capacity
            and all(cursor == i for i, (cursor, _) in enumerate(pending))
            and all(values.keys() == pending[0][1].keys() for _, values in pending)
        )
        if contiguous:
            # The common whole-rollout case: one stack per field.
            for key in pending[0][1]:
                self.storage[key] = jnp.stack([values[key] for _, values in pending])
            return
        for cursor, values in pending:
            for key, value in values.items():
                if key not in self.storage:
                    self.storage[key] = jnp.zeros((self.capacity, *value.shape), value.dtype)
            updated = _write_step({k: self.storage[k] for k in values}, values, jnp.asarray(cursor, jnp.int32))
            self.storage.update(updated)

    def replace_data(self, data: Mapping[str, Any]) -> None:
        """Swaps in a full ``[T, N, ...]`` rollout (the scan path)."""
        self.clear()
        for name, nested in data.items():
            if nested is None:
                continue
            self._check_schema(name, nested)
            for key, value in nest.iterate_nested(nested, prefix=name):
                self.storage[key] = value
        self.full = True

    # -- read path ------------------------------------------------------------

    @property
    def data(self) -> dict[str, Any]:
        """The full nested data dict (a pytree of [T, N, ...] arrays)."""
        self._flush()
        return {name: nest.reconstruct_nested(self.storage, schema) for name, schema in self.schema.items()}

    def sample(self, fn) -> dict[str, Any]:
        """Maps ``fn(flat_name, storage)`` over every leaf, rebuilding nesting."""
        self._flush()
        mapped = {key: fn(key, value) for key, value in self.storage.items()}
        return {name: nest.reconstruct_nested(mapped, schema) for name, schema in self.schema.items()}

    def _check_schema(self, name: str, data) -> None:
        incoming = nest.get_schema(data)
        if name not in self.schema:
            self.schema[name] = _prefix_schema(incoming, name)
        elif self.schema[name] != _prefix_schema(incoming, name):
            raise ValueError(f"Schema mismatch for field '{name}'")


def _prefix_schema(schema, prefix: str):
    if isinstance(schema, dict):
        return {k: _prefix_schema(v, f"{prefix}.{k}") for k, v in schema.items()}
    if isinstance(schema, (list, tuple)):
        seq = [_prefix_schema(v, f"{prefix}.{i}") for i, v in enumerate(schema)]
        return tuple(seq) if isinstance(schema, tuple) else seq
    return prefix


class Sampler:
    """Base sampler: one batch = the whole buffer (cusrl/template/buffer.py:188-207).

    Subclasses (cusrl_tpu/sampler/) generate index plans consumed by the jitted
    update: ``plan(key, capacity, parallelism)`` returns a list of
    ``(metadata, index_spec)`` descriptors.  The base class yields the identity.
    """

    def __call__(self, buffer: Buffer):
        yield {}, buffer.data
