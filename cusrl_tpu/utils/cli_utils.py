"""CLI override layer (counterpart of cusrl/utils/tyro_utils.py + cli_utils.py:12-112).

The reference layers tyro over its factory dataclasses; here a small native
parser applies ``--agent.lr 1e-4``-style dotted-path overrides onto the factory
dataclass tree.  Overrides are recorded into trial ``metadata.json`` and can be
replayed on resume/play via ``--inherit-args``.
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Any

__all__ = ["apply_overrides", "parse_value", "split_cli_overrides"]


def parse_value(text: str) -> Any:
    """Parses a CLI literal: int/float/bool/None/tuple/list/str."""
    lowered = text.lower()
    if lowered in ("true", "false"):
        return lowered == "true"
    if lowered in ("none", "null"):
        return None
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def split_cli_overrides(argv: list[str]) -> tuple[list[str], list[str]]:
    """Splits argv at the first ``--`` separator into (own args, overrides)."""
    if "--" in argv:
        index = argv.index("--")
        return argv[:index], argv[index + 1 :]
    return argv, []


def _set_path(obj: Any, path: list[str], value: Any) -> Any:
    key = path[0]
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        if not hasattr(obj, key):
            raise AttributeError(f"No field '{key}' on {type(obj).__name__}")
        current = getattr(obj, key)
        new_value = value if len(path) == 1 else _set_path(current, path[1:], value)
        try:
            return dataclasses.replace(obj, **{key: new_value})
        except TypeError:
            # Non-init field (or frozen oddity): fall back to attribute set on a copy.
            import copy

            clone = copy.copy(obj)
            object.__setattr__(clone, key, new_value)
            return clone
    if isinstance(obj, dict):
        current = obj.get(key)
        new_value = value if len(path) == 1 else _set_path(current, path[1:], value)
        return {**obj, key: new_value}
    if hasattr(obj, "replace") and hasattr(obj, key):  # Module pytrees
        current = getattr(obj, key)
        new_value = value if len(path) == 1 else _set_path(current, path[1:], value)
        return obj.replace(**{key: new_value})
    raise TypeError(f"Cannot apply override path '{'.'.join(path)}' to {type(obj).__name__}")


def apply_overrides(obj: Any, overrides: list[str]) -> tuple[Any, dict[str, Any]]:
    """Applies ``--a.b.c value`` pairs; returns (new obj, {path: value} applied)."""
    applied: dict[str, Any] = {}
    index = 0
    while index < len(overrides):
        arg = overrides[index]
        if not arg.startswith("--"):
            raise ValueError(f"Expected an override flag (--path.to.field), got '{arg}'")
        key = arg[2:]
        if "=" in key:
            key, _, raw = key.partition("=")
            index += 1
        else:
            if index + 1 >= len(overrides):
                raise ValueError(f"Missing value for override '{arg}'")
            raw = overrides[index + 1]
            index += 2
        value = parse_value(raw)
        obj = _set_path(obj, key.split("."), value)
        applied[key] = raw
    return obj, applied
