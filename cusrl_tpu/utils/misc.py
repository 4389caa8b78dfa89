"""Miscellaneous helpers: seeding, RNG-key discipline, module import.

Counterpart of cusrl/utils/misc.py:143-180 adapted to JAX: the framework threads
explicit ``jax.random`` keys, but python/numpy seeds are still set for host-side
shuffling and dummy environments.
"""

from __future__ import annotations

import importlib
import importlib.util
import random
import sys
from typing import Any

import numpy as np

from cusrl_tpu.utils.config import CONFIG

__all__ = ["MISSING", "import_module", "import_obj", "new_key", "set_global_seed", "to_numpy"]


class _MissingType:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:
        return "MISSING"

    def __bool__(self) -> bool:
        return False


MISSING = _MissingType()


def set_global_seed(seed: int | None = None) -> int:
    """Seeds python/numpy with ``seed + process_index`` and records it in CONFIG.

    Returns the process-local seed.  The JAX side derives keys from this seed via
    ``new_key`` — per-process decorrelation matches the reference's ``seed + rank``
    scheme (cusrl/utils/misc.py:158-160).
    """
    if seed is None:
        seed = random.randint(0, 2**31 - 1)
    CONFIG.seed = int(seed)
    process_seed = CONFIG.process_seed
    random.seed(process_seed)
    np.random.seed(process_seed % (2**32))
    return process_seed


_KEY_COUNTER = [0]


def new_key(seed: int | None = None):
    """Creates a fresh PRNG key from the given or configured process seed.

    Each call folds in a process-wide counter so independently constructed
    components (e.g. a student agent and its expert) get decorrelated
    parameters while the overall sequence stays deterministic per seed —
    matching the advancing-global-RNG semantics of the reference.
    """
    import jax

    base = jax.random.key(CONFIG.process_seed if seed is None else seed)
    if seed is not None:
        return base
    _KEY_COUNTER[0] += 1
    return jax.random.fold_in(base, _KEY_COUNTER[0])


def to_numpy(value: Any) -> np.ndarray:
    return np.asarray(value)


def import_module(module_name: str | None = None, path: str | None = None, args: list[str] | None = None):
    """Imports a module by name or file path, optionally with a temporary argv."""
    if (module_name is None) == (path is None):
        raise ValueError("Specify exactly one of 'module_name' or 'path'.")
    old_argv = sys.argv
    try:
        if args is not None:
            sys.argv = [module_name or path or ""] + list(args)
        if module_name is not None:
            return importlib.import_module(module_name)
        spec = importlib.util.spec_from_file_location("_cusrl_tpu_dynamic", path)
        assert spec is not None and spec.loader is not None
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    finally:
        sys.argv = old_argv


def import_obj(path: str) -> Any:
    """Imports ``module:attr`` or dotted ``module.attr``."""
    if ":" in path:
        module_name, _, attr = path.partition(":")
    else:
        module_name, _, attr = path.rpartition(".")
    module = importlib.import_module(module_name)
    obj: Any = module
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj
