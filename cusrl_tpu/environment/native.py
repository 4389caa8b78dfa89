"""Native (C) vectorized environment adapter.

The reference's performance-critical environments are native simulators
(IsaacLab/mjlab on CUDA — SURVEY.md §2.8); this module demonstrates the same
integration path for CPU-native sims: a C batch stepper (``native/
cartpole_batch.c``) compiled on demand and driven through ctypes with zero-copy
numpy views.  The adapter is a plain host :class:`Environment`, so everything —
Trainer host driver, Player, hooks — works unchanged.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from cusrl_tpu.template.environment import Environment

__all__ = ["NativeCartPoleEnv", "build_native_library"]

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "cartpole_batch.c"
_LIB = _REPO_ROOT / "native" / "libcartpole_batch.so"


def build_native_library(force: bool = False) -> Path:
    """Compiles the C environment library if missing/outdated."""
    if not force and _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    compiler = os.environ.get("CC", "gcc")
    subprocess.run(
        [compiler, "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC), "-lm"],
        check=True,
    )
    return _LIB


class NativeCartPoleEnv(Environment):
    """Batch CartPole backed by the C stepper; discrete actions arrive one-hot."""

    def __init__(self, num_instances: int = 64, seed: int = 0):
        super().__init__(
            observation_dim=4,
            action_dim=2,
            num_instances=num_instances,
            autoreset=False,
        )
        lib = ctypes.CDLL(str(build_native_library()))
        lib.cartpole_reset.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.cartpole_step.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        self._lib = lib
        n = num_instances
        self._state = np.zeros((n, 4), np.float64)
        self._steps = np.zeros(n, np.int32)
        self._reward = np.zeros(n, np.float64)
        self._terminated = np.zeros(n, np.uint8)
        self._truncated = np.zeros(n, np.uint8)
        self._seed = ctypes.c_uint64(seed * 2654435761 + 0x9E3779B97F4A7C15)

    def _ptr(self, array, ctype):
        return array.ctypes.data_as(ctypes.POINTER(ctype))

    def reset(self, indices=None, *, randomize_episode_progress: bool = False):
        n = self.num_instances
        if indices is None:
            index_array = np.arange(n, dtype=np.int32)
        else:
            index_array = np.asarray(indices, np.int32).reshape(-1)
        self._lib.cartpole_reset(
            self._ptr(self._state, ctypes.c_double),
            self._ptr(self._steps, ctypes.c_int32),
            n,
            self._ptr(index_array, ctypes.c_int32),
            len(index_array),
            ctypes.byref(self._seed),
        )
        return self._state.astype(np.float32), None, {}

    def step(self, action):
        action = np.asarray(action)
        discrete = np.argmax(action, axis=-1).astype(np.int32) if action.ndim > 1 else action.astype(np.int32)
        self._lib.cartpole_step(
            self._ptr(self._state, ctypes.c_double),
            self._ptr(self._steps, ctypes.c_int32),
            self.num_instances,
            self._ptr(discrete, ctypes.c_int32),
            self._ptr(self._reward, ctypes.c_double),
            self._ptr(self._terminated, ctypes.c_uint8),
            self._ptr(self._truncated, ctypes.c_uint8),
        )
        return (
            self._state.astype(np.float32),
            None,
            self._reward.astype(np.float32).reshape(-1, 1),
            self._terminated.astype(bool).reshape(-1, 1),
            self._truncated.astype(bool).reshape(-1, 1),
            {},
        )
