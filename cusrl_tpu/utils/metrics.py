"""Running-mean metric accumulators (counterpart of cusrl/utils/metrics.py:31-96).

Values arriving from jitted code are ``jax.Array``s; we convert to numpy lazily — only
at ``summary()`` time — so recording never forces a device sync in the hot loop.
Pending device arrays are batched into one host transfer.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

import numpy as np

__all__ = ["Metrics"]


class _Metric:
    __slots__ = ("mean", "count")

    def __init__(self) -> None:
        self.mean = 0.0
        self.count = 0

    def update(self, mean: float, count: int) -> None:
        if count == 0:
            return
        total = self.count + count
        self.mean = self.mean * (self.count / total) + float(mean) * (count / total)
        self.count = total


class Metrics:
    """Accumulates per-name running means with counts.

    ``record`` accepts scalars, numpy arrays, or jax arrays; device values are kept
    as pending futures and reduced on the host only when ``summary`` is called.
    """

    def __init__(self) -> None:
        self._data: dict[str, _Metric] = {}
        self._pending: list[tuple[str, Any]] = []

    def clear(self) -> None:
        self._data.clear()
        self._pending.clear()

    def __len__(self) -> int:
        self._drain()
        return len(self._data)

    def __iter__(self):
        self._drain()
        return iter(self._data)

    def __getitem__(self, name: str) -> _Metric:
        self._drain()
        return self._data[name]

    def keys(self):
        self._drain()
        return self._data.keys()

    def items(self):
        self._drain()
        return self._data.items()

    def get(self, name, default=None):
        self._drain()
        return self._data.get(name, default)

    def record(self, metrics: Mapping[str, Any] | None = None, /, **kwargs: Any) -> None:
        items = list((metrics or {}).items()) + list(kwargs.items())
        for name, value in items:
            if value is None:
                continue
            self._pending.append((name, value))

    def _drain(self) -> None:
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        for name, value in pending:
            array = np.asarray(value, dtype=np.float64)
            if array.size == 0:
                continue
            self._data.setdefault(name, _Metric()).update(array.mean(), array.size)

    def summary(self, prefix: str = "") -> dict[str, float]:
        self._drain()
        if prefix and not prefix.endswith("/"):
            prefix += "/"
        return {f"{prefix}{name}": metric.mean for name, metric in self._data.items()}
