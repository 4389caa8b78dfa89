"""Shared type aliases (counterpart of cusrl/utils/typing.py)."""

from __future__ import annotations

from typing import Any, Callable, Sequence, TypeAlias, TypeVar, Union

import jax
import numpy as np

__all__ = [
    "Array",
    "ArrayType",
    "ListOrTuple",
    "Memory",
    "MirrorFn",
    "Nested",
    "NestedArray",
    "Observation",
    "Slice",
    "State",
]

_T = TypeVar("_T")

Array: TypeAlias = Union[jax.Array, np.ndarray]
ArrayType = TypeVar("ArrayType", jax.Array, np.ndarray)
Nested: TypeAlias = Any  # leaf | Mapping[str, Nested] | Sequence[Nested]
NestedArray: TypeAlias = Any
Memory: TypeAlias = Any  # None | Array | nested dict of arrays
Observation: TypeAlias = Array
State: TypeAlias = Union[Array, None]
Slice: TypeAlias = Union[slice, Sequence[int], np.ndarray]
MirrorFn: TypeAlias = Callable[[Array], Array]
ListOrTuple: TypeAlias = Union[list, tuple]
