"""Pytree module system — the foundation of the TPU-native NN stack.

Counterpart of the reference ``Module`` contract (cusrl/nn/module/module.py:26-163),
re-designed for JAX: a module IS a frozen-dataclass pytree holding its parameters
inline, so whole agents compose into one pytree that flows through ``jit`` /
``grad`` / ``lax.scan`` without any parameter-dictionary plumbing.

Key ideas:
  * Subclassing :class:`Module` auto-applies ``@dataclass(frozen=True)`` and
    registers the class with ``jax.tree_util.register_dataclass``.
  * Fields declared with :func:`static_field` are pytree metadata (hashable,
    trigger recompilation when changed); everything else is a child pytree.
  * Fields declared with :func:`frozen_field` hold arrays that are *state, not
    parameters* (running statistics, frozen target networks): they travel with
    the pytree but are excluded from :func:`trainable_mask`.
  * :func:`partition` / :func:`combine` implement filtered differentiation:
    ``grad(lambda p: loss(combine(p, rest)))`` over only the trainable leaves.

Forward convention for backbone modules::

    output, new_memory, aux = module(x, memory, sequential=False)

where ``memory`` is ``None`` for feedforward modules and a pytree of ``[N, ...]``
arrays for recurrent ones, and ``aux`` is a dict of intermediate representations
(the functional equivalent of the reference's ``intermediate_repr``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import jax.numpy as jnp

__all__ = [
    "Memory",
    "Module",
    "ModuleFactory",
    "combine",
    "field",
    "frozen_field",
    "partition",
    "reset_memory",
    "static_field",
    "storable_memory",
    "trainable_mask",
    "tree_paths",
]

_T = TypeVar("_T")

Memory = Any  # None | Array | nested dict of arrays


def field(**kwargs):
    return dataclasses.field(**kwargs)


def static_field(**kwargs):
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def frozen_field(**kwargs):
    """A data (pytree) field whose arrays are excluded from trainable parameters."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["frozen"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


# Runtime-adjustable non-trainable scalars (hook weights, clip ratios, schedule
# state).  Identical to frozen_field; the alias documents intent — the functional
# analogue of the reference's ``register_mutable`` (cusrl/template/hook.py:113-141).
mutable_field = frozen_field


class Module:
    """Base class turning subclasses into registered frozen-dataclass pytrees."""

    __frozen_fields__: frozenset[str] = frozenset()
    is_recurrent: bool = False

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        cls = dataclasses.dataclass(frozen=True)(cls)
        data_fields, meta_fields, frozen = [], [], set()
        for f in dataclasses.fields(cls):
            if f.metadata.get("static"):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
                if f.metadata.get("frozen"):
                    frozen.add(f.name)
        # Inherit frozen markers from bases (fields may be re-declared).
        for base in cls.__mro__[1:]:
            frozen |= getattr(base, "__frozen_fields__", frozenset())
        cls.__frozen_fields__ = frozenset(frozen)
        jax.tree_util.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)

    def replace(self: _T, **updates: Any) -> _T:
        return dataclasses.replace(self, **updates)

    # -- memory contract (cusrl/nn/module/module.py:96-140) -------------------

    def init_memory(self, batch_size: int | tuple[int, ...], dtype=jnp.float32) -> Memory:
        """Returns the initial (zero) memory for a batch, or None if feedforward."""
        return None

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        raise NotImplementedError

    # -- counterfactual-append contract ---------------------------------------
    #
    # TPU-native extension with no reference counterpart: lets consumers that
    # need "the module's output for token y[t] as if it were processed right
    # after x[t]" (e.g. GAE bootstrap values for next_states,
    # hook/on_policy/value.py deferred-sequential mode) compute ALL of them in
    # one batched pass instead of running the module twice per rollout step
    # inside the scan.  The contract is exact: eval_next_token(y, ctx)[t] must
    # equal stepping the module on y[t] from the post-x[t] (pre-reset) state,
    # WITHOUT advancing state.

    @property
    def supports_next_token_eval(self) -> bool:
        """True when ``sequential_with_ctx``/``eval_next_token`` are exact for
        this module.  Feedforward modules are trivially supported (no state);
        recurrent modules must override both methods to opt in."""
        return not self.is_recurrent

    def sequential_with_ctx(self, x, memory: Memory, done):
        """Sequence-mode evaluation (``x [T, N, C]``) that also returns an
        opaque context consumed by :meth:`eval_next_token`."""
        out, new_memory, _ = self(x, memory, sequential=True, done=done)
        return out, new_memory, None

    def eval_next_token(self, y, ctx):
        """Counterfactual append: ``out[t] = module(y[t])`` evaluated from the
        state after consuming ``x[0..t]`` (pre-reset at t), without advancing
        state.  ``y [T, N, C]``; ``ctx`` from :meth:`sequential_with_ctx`."""
        if self.is_recurrent:
            raise NotImplementedError(
                f"{type(self).__name__} does not implement next-token evaluation"
            )
        out, _, _ = self(y)
        return out


class ModuleFactory:
    """Base for module factory dataclasses (cusrl/nn/module/module.py Factory
    contract): config-only, called with ``(input_dim, output_dim, key)`` to build
    an initialized Module pytree.  Factories are plain dataclasses (NOT pytrees)
    so they serialize to experiment metadata via utils.dict_utils."""

    def __call__(self, input_dim: int, output_dim: int | None, key: Any) -> "Module":
        raise NotImplementedError

    @property
    def is_recurrent(self) -> bool:
        return False


def reset_memory(memory: Memory, done) -> Memory:
    """Zeroes memory entries where ``done`` is set.

    ``done`` has shape ``[N, 1]`` (or ``[N]``); memory leaves are ``[N, C]`` or
    ``[N, W, C]`` — broadcasting handles both.  Rank-0 leaves are GLOBAL
    (batch-independent) state — e.g. the ring-cache write cursor — and survive
    resets untouched (per-env invalidation happens through the masked leaves).
    TPU-native replacement for the reference's masked in-place zeroing
    (cusrl/nn/module/module.py:120-140).
    """
    if memory is None:
        return None

    def _reset(leaf):
        if leaf.ndim == 0:
            return leaf
        mask = jnp.reshape(done, done.shape[: 1] + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, jnp.zeros_like(leaf), leaf)

    return jax.tree.map(_reset, memory)


def storable_memory(memory: Memory, batch_size: int) -> Memory:
    """Memory view safe to store in a per-step transition: rank-0 (global)
    leaves are broadcast to ``[batch_size]`` so every leaf survives the
    ``[T, N, ...]`` stacking, truncation, and per-env minibatch gathers that
    transition fields go through.  Modules that own global leaves read them
    back via ``leaf.reshape(-1)[0]`` (all entries equal by construction)."""
    if memory is None:
        return None

    def _broadcast(leaf):
        if leaf.ndim == 0:
            return jnp.broadcast_to(leaf, (batch_size,))
        return leaf

    return jax.tree.map(_broadcast, memory)


# -- filtered differentiation ----------------------------------------------------


def _access(obj: Any, entry: Any) -> Any:
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return getattr(obj, entry.name)
    if isinstance(entry, jax.tree_util.DictKey):
        return obj[entry.key]
    if isinstance(entry, (jax.tree_util.SequenceKey, jax.tree_util.FlattenedIndexKey)):
        return obj[entry.idx if hasattr(entry, "idx") else entry.key]
    raise TypeError(f"Unsupported path entry {entry!r}")


def trainable_mask(tree: Any) -> Any:
    """Builds a same-structure pytree of bools marking trainable leaves.

    A leaf is trainable iff it is a floating-point array and no enclosing Module
    marks its field (or an ancestor field) with ``frozen_field``.
    """
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    flags = []
    for path, leaf in paths_and_leaves:
        trainable = hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        if trainable:
            obj = tree
            for entry in path:
                if isinstance(obj, Module) and isinstance(entry, jax.tree_util.GetAttrKey):
                    if entry.name in type(obj).__frozen_fields__:
                        trainable = False
                        break
                obj = _access(obj, entry)
        flags.append(trainable)
    return jax.tree_util.tree_unflatten(treedef, flags)


def partition(tree: Any, mask: Any = None) -> tuple[Any, Any]:
    """Splits ``tree`` into (selected, rest) by the bool mask (default: trainable)."""
    if mask is None:
        mask = trainable_mask(tree)
    selected = jax.tree.map(lambda leaf, flag: leaf if flag else None, tree, mask)
    rest = jax.tree.map(lambda leaf, flag: None if flag else leaf, tree, mask)
    return selected, rest


def combine(*trees: Any) -> Any:
    """Merges partitioned trees: first non-None leaf wins."""

    def _merge(*leaves):
        for leaf in leaves:
            if leaf is not None:
                return leaf
        return None

    return jax.tree.map(_merge, *trees, is_leaf=lambda x: x is None)


def tree_paths(tree: Any, separator: str = ".") -> list[tuple[str, Any]]:
    """Lists ``(dotted_path, leaf)`` for every array leaf — used for param grouping."""

    def _name(entry: Any) -> str:
        if isinstance(entry, jax.tree_util.GetAttrKey):
            return entry.name
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
        if isinstance(entry, jax.tree_util.SequenceKey):
            return str(entry.idx)
        if isinstance(entry, jax.tree_util.FlattenedIndexKey):
            return str(entry.key)
        return str(entry)

    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out.append((separator.join(_name(e) for e in path), leaf))
    return out
