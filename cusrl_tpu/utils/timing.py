"""Wall-clock timing utilities (counterpart of cusrl/utils/timing.py:32-212).

On TPU there are no CUDA events; accurate device timing uses
``jax.block_until_ready`` brackets around ``perf_counter``.  ``Timer.record`` is a
context manager accumulating named buckets; ``Rate`` paces a real-time loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

__all__ = ["Rate", "Timer", "sync"]


def sync(*values: Any) -> None:
    """Blocks until all jax arrays inside the given pytrees are computed."""
    import jax

    for value in values:
        jax.block_until_ready(value)


class Timer:
    """Accumulates wall-clock time into named buckets.

    Args:
        synchronize: If True, each bucket exit blocks on outstanding device work
            so the measured span covers actual TPU execution.
    """

    def __init__(self, synchronize: bool = False):
        self.synchronize = synchronize
        self._totals: dict[str, float] = {}
        self._counts: dict[str, int] = {}

    @contextlib.contextmanager
    def record(self, name: str, *block_on: Any):
        if self.synchronize:
            sync(*block_on)
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.synchronize:
                sync(*block_on)
            elapsed = time.perf_counter() - start
            self._totals[name] = self._totals.get(name, 0.0) + elapsed
            self._counts[name] = self._counts.get(name, 0) + 1

    def add(self, name: str, seconds: float) -> None:
        self._totals[name] = self._totals.get(name, 0.0) + seconds
        self._counts[name] = self._counts.get(name, 0) + 1

    def total(self, name: str) -> float:
        return self._totals.get(name, 0.0)

    def mean(self, name: str) -> float:
        count = self._counts.get(name, 0)
        return self._totals.get(name, 0.0) / count if count else 0.0

    def clear(self) -> None:
        self._totals.clear()
        self._counts.clear()

    def summary(self) -> dict[str, float]:
        return dict(self._totals)


class Rate:
    """Real-time loop pacing at a fixed frequency (0 disables pacing)."""

    def __init__(self, frequency: float):
        self.frequency = frequency
        self.period = 1.0 / frequency if frequency > 0 else 0.0
        self._next_tick: float | None = None

    def reset(self) -> None:
        self._next_tick = None

    def tick(self) -> None:
        if self.period <= 0:
            return
        now = time.perf_counter()
        if self._next_tick is None:
            self._next_tick = now + self.period
            return
        sleep_for = self._next_tick - now
        if sleep_for > 0:
            time.sleep(sleep_for)
            self._next_tick += self.period
        else:
            # Fell behind; re-anchor instead of bursting.
            self._next_tick = now + self.period
