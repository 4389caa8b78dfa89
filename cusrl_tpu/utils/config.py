"""Runtime configuration singleton for the TPU-native runtime.

Counterpart of the reference runtime config (cusrl/utils/config.py:13-191), re-imagined
for JAX: instead of pinning a CUDA device per torchrun process, we describe the global
device mesh once.  Data parallelism is expressed as a named mesh axis (``data``) and an
optional ``model`` axis is reserved for tensor-sharded layers, so a data-parallel run
today can become DP x TP without touching user code.

JAX process bootstrap (the torchrun equivalent) is performed lazily by
``configure_distributed()`` which calls ``jax.distributed.initialize`` when the standard
coordinator environment variables are present.
"""

from __future__ import annotations

import dataclasses
import os
from functools import cached_property
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    import jax

__all__ = [
    "CONFIG",
    "RuntimeConfig",
    "configure_distributed",
    "device_count",
    "enable_compilation_cache",
    "mesh",
]


def _env_int(name: str, default: int | None = None) -> int | None:
    value = os.environ.get(name)
    if value is None:
        return default
    return int(value)


@dataclasses.dataclass
class RuntimeConfig:
    """Global runtime state: process topology, mesh layout, seed, precision.

    Attributes:
        seed: Base random seed; per-process seed is ``seed + process_index``.
        data_axis: Mesh axis name used for data parallelism.
        model_axis: Mesh axis name reserved for model (tensor) parallelism.
        model_parallel_size: Number of devices along the model axis (1 = pure DP).
        compute_dtype: Preferred compute dtype for backbone matmuls ("bfloat16"
            keeps the MXU fed; distribution math / value heads stay float32).
    """

    seed: int = 0
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1
    compute_dtype: str = "bfloat16"
    _distributed_initialized: bool = dataclasses.field(default=False, repr=False)
    _mesh_cache: Any = dataclasses.field(default=None, repr=False)

    # -- process topology ---------------------------------------------------------

    @property
    def process_index(self) -> int:
        import jax

        return jax.process_index()

    @property
    def process_count(self) -> int:
        import jax

        return jax.process_count()

    @property
    def rank(self) -> int:
        return self.process_index

    @property
    def world_size(self) -> int:
        return self.process_count

    @property
    def is_main_process(self) -> bool:
        return self.process_index == 0

    @cached_property
    def platform(self) -> str:
        import jax

        return jax.devices()[0].platform

    # -- mesh ---------------------------------------------------------------------

    def mesh(self, model_parallel_size: int | None = None) -> "jax.sharding.Mesh":
        """Builds (and caches) the global 2-D ``(data, model)`` device mesh.

        With ``model_parallel_size == 1`` this degenerates to a 1-D data mesh, the
        TPU-native analogue of the reference's pure data-parallel strategy
        (cusrl/utils/config.py:160-187 + distributed.py).
        """
        import jax
        import numpy as np

        mp = model_parallel_size or self.model_parallel_size
        cached = self._mesh_cache
        if cached is not None and cached.devices.size == len(jax.devices()) and cached.shape[self.model_axis] == mp:
            return cached
        devices = np.asarray(jax.devices())
        if devices.size % mp != 0:
            raise ValueError(f"device count {devices.size} not divisible by model_parallel_size {mp}")
        devices = devices.reshape(devices.size // mp, mp)
        self._mesh_cache = jax.sharding.Mesh(devices, (self.data_axis, self.model_axis))
        return self._mesh_cache

    def clear_mesh_cache(self) -> None:
        self._mesh_cache = None

    # -- seeding ------------------------------------------------------------------

    @property
    def process_seed(self) -> int:
        return self.seed + self.process_index


CONFIG = RuntimeConfig()


def configure_distributed(timeout_s: int = 300) -> None:
    """Initializes multi-process JAX if coordinator env vars are present.

    The torchrun contract of the reference (RANK/WORLD_SIZE env vars,
    cusrl/utils/config.py:160-187) maps to the JAX coordinator contract:
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.
    A single-process run is a silent no-op, so the same entry point works on a
    laptop CPU, one TPU host, or a multi-host slice.
    """
    if CONFIG._distributed_initialized:
        return
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = _env_int("JAX_NUM_PROCESSES") or _env_int("NUM_PROCESSES")
    # `or` would turn rank 0 into None — 0 is falsy.
    process_id = _env_int("JAX_PROCESS_ID")
    if process_id is None:
        process_id = _env_int("PROCESS_ID")
    if coordinator is not None and num_processes and num_processes > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
    CONFIG._distributed_initialized = True


_DISABLE_VALUES = ("", "0", "off", "none", "disabled")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Wires JAX's persistent compilation cache (counterpart of the reference's
    per-rank compiler cache dirs, cusrl/utils/config.py:121-146).

    First compiles over a remote-TPU tunnel take minutes; caching the serialized
    executables makes every later invocation of the same program near-instant.
    Unlike torchinductor/triton caches, JAX's persistent cache is content-
    addressed and safe for concurrent writers, so one shared per-host directory
    replaces the reference's per-rank scheme.

    Resolution order: explicit ``cache_dir`` argument →
    ``CUSRL_TPU_COMPILATION_CACHE_DIR`` env var ("0"/"off" disables) →
    ``~/.cache/cusrl_tpu/xla_cache``.  MUST run before the first jit compile
    (config flips after a compile do not retroactively cache it); callers are
    the CLI dispatcher, bench.py, and the dryrun entry.  Returns the directory
    used, or None when disabled.
    """
    env = os.environ.get("CUSRL_TPU_COMPILATION_CACHE_DIR")
    if env is not None:
        if env.strip().lower() in _DISABLE_VALUES:
            return None
        cache_dir = env
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "cusrl_tpu", "xla_cache")
    import jax

    if jax.default_backend() == "cpu" and os.environ.get("CUSRL_TPU_CACHE_CPU", "0") != "1":
        # CPU compiles are fast and XLA:CPU AOT entries are machine-feature
        # pinned (loading one compiled under a different feature snapshot
        # logs SIGILL-risk errors); the cache's value is the minutes-long
        # remote-TPU compiles.  CUSRL_TPU_CACHE_CPU=1 opts CPU runs in.
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took >=1 s to compile (the tiny CPU-test programs
    # stay out; every real TPU program over the tunnel is far above this).
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ.get("CUSRL_TPU_CACHE_MIN_COMPILE_SECS", "1.0")),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def device_count() -> int:
    import jax

    return len(jax.devices())


def mesh(model_parallel_size: int | None = None) -> "jax.sharding.Mesh":
    return CONFIG.mesh(model_parallel_size)
