"""Device memory observability (counterpart of cusrl/hook/control/empty_cuda_cache.py).

XLA manages HBM with static allocation — there is no cache to empty — so the
TPU-native equivalent records per-iteration device memory statistics instead.
``EmptyCudaCache`` is kept as an alias for API parity with the reference.
"""

from __future__ import annotations

from cusrl_tpu.nn.base import static_field
from cusrl_tpu.template.hook import Hook

__all__ = ["DeviceMemoryStats", "EmptyCudaCache"]


class DeviceMemoryStats(Hook):
    training_only: bool = static_field(default=True, kw_only=True)

    def apply_schedule(self, iteration: int, agent=None):
        import jax

        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            return self
        if agent is not None and "bytes_in_use" in stats:
            agent.record(
                **{
                    "Memory/device_bytes_in_use": float(stats["bytes_in_use"]),
                    "Memory/device_peak_bytes": float(stats.get("peak_bytes_in_use", 0)),
                }
            )
        return self


EmptyCudaCache = DeviceMemoryStats
