"""Nested-container (pytree-of-arrays) utilities.

Counterpart of cusrl/utils/nest.py:7-402.  Most of what the reference hand-rolls
comes free from ``jax.tree_util``; what remains is the *string-keyed schema*
representation the Buffer uses to validate transitions and to round-trip
flatten/reconstruct nested dicts with dotted key paths.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any, TypeVar

__all__ = [
    "flatten_nested",
    "get_schema",
    "iterate_nested",
    "map_nested",
    "reconstruct_nested",
    "zip_nested",
]

_T = TypeVar("_T")

Nested = Any  # scalar | Mapping[str, Nested] | list/tuple[Nested]


def _concat(prefix: str, sep: str, suffix: Any) -> str:
    if prefix == "":
        return str(suffix)
    return f"{prefix}{sep}{suffix}"


def get_schema(data: Nested, separator: str = ".") -> Nested:
    """Mirrors the nested structure with dotted-path leaf names.

    ``{"a": {"b": x}, "c": y}`` -> ``{"a": {"b": "a.b"}, "c": "c"}``
    """

    def walk(value: Nested, prefix: str) -> Nested:
        if isinstance(value, Mapping):
            return {k: walk(v, _concat(prefix, separator, k)) for k, v in value.items()}
        if isinstance(value, (list, tuple)):
            walked = [walk(v, _concat(prefix, separator, i)) for i, v in enumerate(value)]
            return type(value)(walked) if isinstance(value, tuple) else walked
        return prefix

    return walk(data, "")


def iterate_nested(data: Nested, separator: str = ".", prefix: str = ""):
    """Yields ``(dotted_path, leaf)`` pairs in deterministic order."""
    if isinstance(data, Mapping):
        for key, value in data.items():
            yield from iterate_nested(value, separator, _concat(prefix, separator, key))
    elif isinstance(data, (list, tuple)):
        for index, value in enumerate(data):
            yield from iterate_nested(value, separator, _concat(prefix, separator, index))
    else:
        yield prefix, data


def flatten_nested(data: Nested, separator: str = ".") -> dict[str, Any]:
    return dict(iterate_nested(data, separator))


def map_nested(func: Callable[[Any], Any], data: Nested) -> Nested:
    if isinstance(data, Mapping):
        return {k: map_nested(func, v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        mapped = [map_nested(func, v) for v in data]
        return tuple(mapped) if isinstance(data, tuple) else mapped
    return func(data)


def zip_nested(*trees: Nested) -> Nested:
    """Zips multiple same-structure trees into one tree of tuples."""
    head = trees[0]
    if isinstance(head, Mapping):
        return {k: zip_nested(*(t[k] for t in trees)) for k in head}
    if isinstance(head, (list, tuple)):
        zipped = [zip_nested(*(t[i] for t in trees)) for i in range(len(head))]
        return tuple(zipped) if isinstance(head, tuple) else zipped
    return tuple(trees)


def reconstruct_nested(flattened: dict[str, Any], schema: Nested) -> Nested:
    """Inverse of ``flatten_nested`` given the schema from ``get_schema``."""
    if isinstance(schema, Mapping):
        return {k: reconstruct_nested(flattened, v) for k, v in schema.items()}
    if isinstance(schema, (list, tuple)):
        rebuilt = [reconstruct_nested(flattened, v) for v in schema]
        return tuple(rebuilt) if isinstance(schema, tuple) else rebuilt
    return flattened[schema]
