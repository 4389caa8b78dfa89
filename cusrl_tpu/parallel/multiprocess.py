"""Cross-process (multi-host) data-parallel training glue.

The TPU-native counterpart of the reference's torchrun DDP recipe
(cusrl/utils/distributed.py:58-63 broadcast_parameters + 145-172
reduce_gradients): parameters are replicated across processes, each process
collects rollouts from its OWN environment instances, and the update runs as
ONE global jitted step over the concatenated batch — XLA inserts the gradient
all-reduce over ICI/DCN because the batch is sharded and the parameters are
replicated.

Usage per process (after ``configure_distributed()``)::

    agent = factory(env_spec)            # identical architecture on every rank
    broadcast_agent_state(agent)         # rank-0 weights everywhere
    ...collect a [T, N_local] rollout into agent.buffer...
    metrics = cross_process_update(agent)  # global DDP-equivalent step

Every process ends each update holding the same replicated parameters (the
global computation is deterministic), so checkpointing stays rank-0-only and
resume works from any rank's view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["broadcast_agent_state", "cross_process_update", "globalize_rollout", "process_mesh"]


def process_mesh() -> Mesh:
    """A 1-D ``data`` mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), ("data",))


def broadcast_agent_state(agent) -> None:
    """Replicates rank 0's agent state to every process (the counterpart of the
    reference's broadcast_parameters at agent construction,
    cusrl/template/actor_critic.py:224)."""
    from jax.experimental import multihost_utils

    def _to_data(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(leaf)
        return leaf

    def _from_data(template, data):
        if hasattr(template, "dtype") and jnp.issubdtype(template.dtype, jax.dtypes.prng_key):
            return jax.random.wrap_key_data(jnp.asarray(data), impl=jax.random.key_impl(template))
        return jnp.asarray(data)

    broadcast = multihost_utils.broadcast_one_to_all(jax.tree.map(_to_data, agent.state))
    agent.state = jax.tree.map(_from_data, agent.state, broadcast)


def globalize_rollout(rollout: dict, mesh: Mesh, env_axis: int = 1) -> dict:
    """Assembles per-process ``[T, N_local, ...]`` rollout arrays into global
    arrays sharded over ``data`` at ``env_axis`` (the environment dimension) —
    process-local environment batches become one global batch."""

    def _globalize(leaf):
        leaf = np.asarray(leaf)
        spec = [None] * leaf.ndim
        if leaf.ndim > env_axis:
            spec[env_axis] = "data"
        return jax.make_array_from_process_local_data(NamedSharding(mesh, P(*spec)), leaf)

    return jax.tree.map(_globalize, rollout)


def cross_process_update(
    agent, mesh: Mesh | None = None, key: jax.Array | None = None, rollout: dict | None = None
) -> dict:
    """Runs one agent update over the concatenation of every process's buffer
    (or an explicitly provided per-process ``[T, N_local, ...]`` rollout).

    The shuffle key must agree across processes (each rank sees the same global
    permutation); by default it derives from the BASE seed and the iteration —
    not from the per-process key stream, which is intentionally rank-offset for
    environment decorrelation.
    """
    from cusrl_tpu.utils.config import CONFIG

    mesh = mesh or process_mesh()
    if key is None:
        key = jax.random.fold_in(jax.random.key(CONFIG.seed or 0), int(agent.iteration))
    local = agent.buffer.data if rollout is None else rollout
    global_rollout = globalize_rollout(local, mesh)

    def _replicate(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), np.asarray(jax.random.key_data(leaf))
            )
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(leaf))
        return jax.make_array_from_process_local_data(NamedSharding(mesh, P()), np.asarray(leaf))

    state = jax.tree.map(_replicate, agent.state)
    buffer_state = {
        "cursor": jnp.asarray(agent.buffer.cursor if rollout is None else agent.buffer.capacity, jnp.int32),
        "full": jnp.asarray(agent.buffer.full if rollout is None else True),
    }
    update_jit = getattr(agent, "_mp_update_jit", None)
    if update_jit is None:
        update_jit = jax.jit(agent.update_body)
        agent._mp_update_jit = update_jit
    new_state, metrics = update_jit(state, global_rollout, key, buffer_state)
    # The result is replicated: every process holds the full new state.
    agent.state = jax.tree.map(jnp.asarray, jax.device_get(new_state))
    agent.record(jax.device_get(metrics))
    return agent.finish_update()
