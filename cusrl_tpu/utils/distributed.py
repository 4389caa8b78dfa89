"""Multi-process helpers (counterpart of cusrl/utils/distributed.py:12-188).

Design difference from the reference: gradient and statistics reduction do NOT live
here.  On TPU those collectives happen *inside* the jitted update step — XLA inserts
the all-reduce automatically when replicated parameters receive gradients from a
batch sharded over the ``data`` mesh axis.  What remains host-side is coordination:
metric averaging across processes, rank-0 printing/logging discipline, and object
broadcast for log-directory agreement.  Every helper degrades to a no-op in a
single-process run so the test suite runs anywhere.
"""

from __future__ import annotations

import builtins
from typing import Any, TypeVar

__all__ = [
    "average_dict",
    "barrier",
    "broadcast_obj",
    "enabled",
    "gather_obj",
    "gather_print",
    "is_main_process",
    "print_rank0",
    "rank",
    "world_size",
]

_T = TypeVar("_T")


def enabled() -> bool:
    import jax

    return jax.process_count() > 1


def rank() -> int:
    import jax

    return jax.process_index()


def world_size() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return rank() == 0


def barrier() -> None:
    if not enabled():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("cusrl_tpu.barrier")


_MAX_OBJ_BYTES = 1 << 16


def _obj_to_u8(obj) -> "np.ndarray":
    import pickle

    import numpy as np

    payload = pickle.dumps(obj)
    if len(payload) + 8 > _MAX_OBJ_BYTES:
        raise ValueError(f"object too large to gather ({len(payload)} bytes)")
    buf = np.zeros(_MAX_OBJ_BYTES, np.uint8)
    buf[:8] = np.frombuffer(len(payload).to_bytes(8, "little"), np.uint8)
    buf[8 : 8 + len(payload)] = np.frombuffer(payload, np.uint8)
    return buf


def _u8_to_obj(buf) -> Any:
    import pickle

    import numpy as np

    buf = np.asarray(buf, np.uint8)
    size = int.from_bytes(buf[:8].tobytes(), "little")
    return pickle.loads(buf[8 : 8 + size].tobytes())


def gather_obj(obj: _T) -> list[_T]:
    """Gathers an arbitrary picklable object from every process (pickled into
    a fixed-size uint8 buffer and ``process_allgather``-ed)."""
    if not enabled():
        return [obj]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(_obj_to_u8(obj))
    return [_u8_to_obj(row) for row in gathered]


def broadcast_obj(obj: _T) -> _T:
    """Broadcasts a picklable object from process 0 to all processes."""
    if not enabled():
        return obj
    return gather_obj(obj)[0]


def average_dict(info: dict[str, float]) -> dict[str, float]:
    """Averages a metric dict across processes (all keys must agree)."""
    if not enabled():
        return dict(info)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    keys = sorted(info)
    values = jnp.asarray([float(info[k]) for k in keys])
    mean = multihost_utils.process_allgather(values).mean(axis=0)  # pragma: no cover
    return dict(zip(keys, [float(v) for v in mean]))  # pragma: no cover


def print_rank0(*args: Any, **kwargs: Any) -> None:
    if is_main_process():
        builtins.print(*args, **kwargs)


def gather_print(*args: Any, **kwargs: Any) -> None:
    """Prints from every process, prefixed and ordered by rank."""
    if not enabled():
        builtins.print(*args, **kwargs)
        return
    for index in range(world_size()):  # pragma: no cover
        if index == rank():
            builtins.print(f"[rank {index}]", *args, **kwargs)
        barrier()
