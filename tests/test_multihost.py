"""Multi-host bootstrap exercised with two REAL processes (counterpart of the
reference's torchrun DDP contract, cusrl/utils/config.py:160-187 +
utils/distributed.py:12-188).

Two subprocesses join a jax.distributed coordinator on localhost via the env
contract that ``configure_distributed`` consumes, then verify rank/world-size,
``average_dict`` across processes, rank-0-only checkpoint directories, and a
cross-process ``psum``.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")

from cusrl_tpu.utils.config import CONFIG, configure_distributed
from cusrl_tpu.utils import distributed

configure_distributed(timeout_s=60)

rank = distributed.rank()
world = distributed.world_size()
assert distributed.enabled(), "distributed must be enabled with 2 processes"

# average_dict must average across processes.
avg = distributed.average_dict({"x": float(rank), "y": 10.0 * (rank + 1)})

# gather/broadcast object plumbing.
gathered = distributed.gather_obj(f"proc{rank}")
bcast = distributed.broadcast_obj(f"root-value" if rank == 0 else None)

# A real collective over the process-spanning device set.
import jax.numpy as jnp
from jax.experimental import multihost_utils
val = multihost_utils.process_allgather(jnp.asarray([float(rank + 1)]))

# rank-0-only logger directories.
out_dir = os.path.join(os.environ["TEST_TMP"], "logs")
from cusrl_tpu.template.logger import Logger
logger = Logger(log_dir=out_dir, name="mh")
distributed.barrier()  # rank 0 creates the directories; wait before checking
made_dirs = os.path.isdir(logger.ckpt_dir)

print("RESULT " + json.dumps({
    "rank": rank, "world": world, "avg": avg, "gathered": gathered,
    "bcast": bcast, "allgather": [float(v) for v in val.reshape(-1)],
    "is_main": distributed.is_main_process(), "made_dirs": made_dirs,
    "log_dir": str(logger.log_dir),
}))
"""


def test_two_process_bootstrap(tmp_path):
    port = _free_port()
    env_base = {
        **os.environ,
        "REPO_ROOT": os.getcwd(),
        "TEST_TMP": str(tmp_path),
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PLATFORMS": "cpu",
    }
    procs = []
    for rank in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(rank)}
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    results = {}
    for rank, proc in enumerate(procs):
        out, err = proc.communicate(timeout=150)
        assert proc.returncode == 0, f"rank {rank} failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[rank] = json.loads(line[len("RESULT "):])

    for rank, r in results.items():
        assert r["world"] == 2 and r["rank"] == rank
        # average_dict: x = mean(0, 1) = 0.5; y = mean(10, 20) = 15.
        assert r["avg"]["x"] == pytest.approx(0.5)
        assert r["avg"]["y"] == pytest.approx(15.0)
        assert r["gathered"] == ["proc0", "proc1"]
        assert r["bcast"] == "root-value"
        assert r["allgather"] == [1.0, 2.0]
        assert r["is_main"] == (rank == 0)
        # rank-0 creates directories; both agree on rank-0's path.
        assert r["made_dirs"]
    assert results[0]["log_dir"] == results[1]["log_dir"]
