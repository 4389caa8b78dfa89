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
    """Builds pack/unpack specs from an example pytree (static structure).

    Leaves at or above ``passthrough_bytes`` travel as their OWN arguments
    (``__big<i>`` entries in the buffer dict): packing exists to amortize the
    per-argument dispatch overhead of MANY SMALL leaves, but flattening a
    multi-MB buffer costs a real reshape/concat round-trip per iteration — the
    attention ring caches (4 × 17 MB bf16) traced at several ms/iter of
    layout-converting copies through the packed buffer before this cutoff.
    """

    def __init__(self, example: Any, passthrough_bytes: int = 1 << 20):
        leaves, self.treedef = jax.tree.flatten(example)
        self._specs: list[tuple[str, int, tuple[int, ...], Any, Any]] = []
        # (group, offset, shape, transport_dtype, original_key_impl_or_None);
        # group "__big<i>" = passthrough leaf (offset unused).
        offsets: dict[str, int] = {}
        n_big = 0
        for leaf in leaves:
            leaf = jnp.asarray(leaf)
            if _is_key_dtype(leaf.dtype):
                data = jax.random.key_data(leaf)
                group = str(data.dtype)
                self._specs.append((group, offsets.get(group, 0), tuple(data.shape), data.dtype, leaf.dtype))
                offsets[group] = offsets.get(group, 0) + int(data.size)
                continue
            if leaf.size * leaf.dtype.itemsize >= passthrough_bytes:
                self._specs.append((f"__big{n_big}", 0, tuple(leaf.shape), leaf.dtype, None))
                n_big += 1
                continue
            group = str(leaf.dtype)
            self._specs.append((group, offsets.get(group, 0), tuple(leaf.shape), leaf.dtype, None))
            offsets[group] = offsets.get(group, 0) + int(leaf.size)
        self.group_sizes = dict(offsets)

    @property
    def num_leaves(self) -> int:
        return len(self._specs)

    def pack(self, tree: Any) -> dict[str, jax.Array]:
        """Traceable: tree -> {dtype_name_or___big<i>: buffer}."""
        leaves = jax.tree.leaves(tree)
        chunks: dict[str, list[jax.Array]] = {}
        out: dict[str, jax.Array] = {}
        for leaf, (group, _, _, transport_dtype, key_dtype) in zip(leaves, self._specs):
            leaf = jnp.asarray(leaf)
            if key_dtype is not None:
                leaf = jax.random.key_data(leaf)
            if group.startswith("__big"):
                out[group] = leaf
                continue
            chunks.setdefault(group, []).append(leaf.astype(transport_dtype).reshape(-1))
        out.update({group: jnp.concatenate(parts) for group, parts in chunks.items()})
        return out

    def unpack(self, buffers: dict[str, jax.Array]) -> Any:
        """Traceable: {dtype_name_or___big<i>: buffer} -> tree."""
        leaves = []
        for group, offset, shape, transport_dtype, key_dtype in self._specs:
            if group.startswith("__big"):
                leaves.append(buffers[group])
                continue
            size = 1
            for dim in shape:
                size *= dim
            leaf = buffers[group][offset : offset + size].reshape(shape)  # static slice
            if key_dtype is not None:
                leaf = jax.random.wrap_key_data(leaf)
            leaves.append(leaf)
        return jax.tree.unflatten(self.treedef, leaves)
