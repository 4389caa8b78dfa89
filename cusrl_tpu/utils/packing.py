"""Pytree argument packing: many leaves <-> a few flat per-dtype buffers.

Motivation: dispatching a jitted program costs per-ARGUMENT overhead (buffer
handle bookkeeping; substantial over remote-TPU transports — measured ~0.3 ms
per leaf on the axon tunnel, a ~60 ms floor for a 200-leaf AgentState).  The
training carry therefore crosses the jit boundary as ONE buffer per dtype;
pack/unpack are traceable and run inside the program (device-side reshapes and
slices — nanoseconds of HBM traffic).

PRNG key arrays (extended dtypes) are transported as their uint32 key data.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["TreePacker"]


def _is_key_dtype(dtype) -> bool:
    try:
        return jnp.issubdtype(dtype, jax.dtypes.prng_key)
    except Exception:
        return False


class TreePacker:
    """Builds pack/unpack specs from an example pytree (static structure)."""

    def __init__(self, example: Any):
        leaves, self.treedef = jax.tree.flatten(example)
        self._specs: list[tuple[str, int, tuple[int, ...], Any, Any]] = []
        # (group, offset, shape, transport_dtype, original_key_impl_or_None)
        offsets: dict[str, int] = {}
        for leaf in leaves:
            leaf = jnp.asarray(leaf)
            if _is_key_dtype(leaf.dtype):
                data = jax.random.key_data(leaf)
                group = str(data.dtype)
                size = int(data.size)
                self._specs.append((group, offsets.get(group, 0), tuple(data.shape), data.dtype, leaf.dtype))
            else:
                group = str(leaf.dtype)
                size = int(leaf.size)
                self._specs.append((group, offsets.get(group, 0), tuple(leaf.shape), leaf.dtype, None))
            offsets[group] = offsets.get(group, 0) + size
        self.group_sizes = dict(offsets)

    @property
    def num_leaves(self) -> int:
        return len(self._specs)

    def pack(self, tree: Any) -> dict[str, jax.Array]:
        """Traceable: tree -> {dtype_name: flat 1-D buffer}."""
        leaves = jax.tree.leaves(tree)
        chunks: dict[str, list[jax.Array]] = {}
        for leaf, (group, _, _, transport_dtype, key_dtype) in zip(leaves, self._specs):
            leaf = jnp.asarray(leaf)
            if key_dtype is not None:
                leaf = jax.random.key_data(leaf)
            chunks.setdefault(group, []).append(leaf.astype(transport_dtype).reshape(-1))
        return {group: jnp.concatenate(parts) for group, parts in chunks.items()}

    def unpack(self, buffers: dict[str, jax.Array]) -> Any:
        """Traceable: {dtype_name: flat buffer} -> tree."""
        leaves = []
        for group, offset, shape, transport_dtype, key_dtype in self._specs:
            size = 1
            for dim in shape:
                size *= dim
            leaf = buffers[group][offset : offset + size].reshape(shape)  # static slice
            if key_dtype is not None:
                leaf = jax.random.wrap_key_data(leaf)
            leaves.append(leaf)
        return jax.tree.unflatten(self.treedef, leaves)
