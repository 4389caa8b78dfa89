"""Object <-> dict serialization for configuration trees.

Counterpart of cusrl/utils/dict_utils.py:25-205.  Factory dataclasses (agents, hooks,
optimizers, environments) serialize to plain JSON-able dicts with a ``__class__`` tag
of the form ``"module:QualName"`` so experiment metadata can be recorded to
``metadata.json`` and replayed on resume (``--inherit-args``).
"""

from __future__ import annotations

import dataclasses
import importlib
from collections.abc import Mapping
from typing import Any, TypeVar

__all__ = ["from_dict", "get_first", "prefix_dict_keys", "to_dict"]

_K = TypeVar("_K")
_V = TypeVar("_V")

CLASS_TAG = "__class__"

_MISSING = object()


def _class_path(cls: type) -> str:
    return f"{cls.__module__}:{cls.__qualname__}"


def _resolve_class(path: str) -> type:
    module_name, _, qualname = path.partition(":")
    obj: Any = importlib.import_module(module_name)
    for part in qualname.split("."):
        obj = getattr(obj, part)
    return obj


def to_dict(obj: Any) -> Any:
    """Recursively converts dataclasses to tagged dicts (lists/dicts/scalars pass through)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        result: dict[str, Any] = {CLASS_TAG: _class_path(type(obj))}
        for field in dataclasses.fields(obj):
            if not field.repr and field.name.startswith("_"):
                continue
            result[field.name] = to_dict(getattr(obj, field.name))
        return result
    if isinstance(obj, Mapping):
        return {key: to_dict(value) for key, value in obj.items()}
    if isinstance(obj, (list, tuple)):
        converted = [to_dict(value) for value in obj]
        return converted if isinstance(obj, list) else tuple(converted)
    if isinstance(obj, type):
        return {CLASS_TAG: _class_path(obj), "__is_type__": True}
    if callable(obj) and hasattr(obj, "__module__") and hasattr(obj, "__qualname__") and "<" not in obj.__qualname__:
        return {CLASS_TAG: f"{obj.__module__}:{obj.__qualname__}", "__is_type__": True}
    return obj


def from_dict(data: Any, obj: Any = None) -> Any:
    """Inverse of ``to_dict``: rebuilds tagged dataclasses recursively.

    If ``obj`` (a template instance) is provided and ``data`` is an untagged dict,
    fields of ``obj`` are overridden by matching keys (dataclasses.replace semantics).
    """
    if isinstance(data, Mapping):
        if CLASS_TAG in data:
            cls = _resolve_class(data[CLASS_TAG])
            if data.get("__is_type__"):
                return cls
            kwargs = {k: from_dict(v) for k, v in data.items() if k not in (CLASS_TAG, "__is_type__")}
            if dataclasses.is_dataclass(cls):
                names = {f.name for f in dataclasses.fields(cls) if f.init}
                kwargs = {k: v for k, v in kwargs.items() if k in names}
            return cls(**kwargs)
        if obj is not None and dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            updates = {}
            for field in dataclasses.fields(obj):
                if field.name in data:
                    updates[field.name] = from_dict(data[field.name], getattr(obj, field.name))
            return dataclasses.replace(obj, **updates)
        return {k: from_dict(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        rebuilt = [from_dict(v) for v in data]
        return rebuilt if isinstance(data, list) else tuple(rebuilt)
    return data


def get_first(data: Mapping[_K, _V], *keys: _K, default: Any = _MISSING) -> Any:
    """Returns the first present key's value; raises KeyError if none present and no default."""
    for key in keys:
        if key in data:
            return data[key]
    if default is _MISSING:
        raise KeyError(f"None of {keys!r} present")
    return default


def prefix_dict_keys(data: Mapping[str, _V], prefix: str) -> dict[str, _V]:
    return {f"{prefix}{key}": value for key, value in data.items()}
