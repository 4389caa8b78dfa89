"""Device-mesh sharding (the TPU-native replacement for the reference's
torchrun DDP + manual NCCL collectives; SURVEY.md §2.6).

Strategy: a 2-D ``(data, model)`` mesh.

* **Data parallelism** (the reference's only strategy): parameters replicated,
  environment instances / rollout batches sharded over ``data``.  Gradients are
  all-reduced automatically by XLA inside the jitted update — no explicit
  collective calls anywhere in framework code; running statistics computed over
  the globally-sharded batch are global for the same reason.
* **Tensor parallelism** (reserved headroom beyond the reference): MLP hidden
  layers can be sharded over ``model`` by alternating row/column partitioning
  (Megatron-style); XLA inserts the psum at the sharding boundary.

Everything is expressed as ``NamedSharding`` placements applied by dotted-path
pattern — the same path naming the optimizer and GradientClipping use.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cusrl_tpu.nn.base import tree_paths

__all__ = [
    "collect_tp_specs",
    "data_axes",
    "distribute_agent",
    "get_mesh",
    "replicate",
    "shard_batch",
    "tensor_parallel_rules",
]


def get_mesh(model_parallel_size: int = 1, devices=None, dcn_parallel_size: int = 1) -> Mesh:
    """Builds a ``(data, model)`` — or hierarchical ``(dcn, data, model)`` —
    mesh over all (or the given) devices.

    ``dcn_parallel_size > 1`` names the slow outer axis explicitly (hosts over
    DCN): batches shard over the COMBINED ``(dcn, data)`` axes (``data_axes``),
    so per-device layouts are identical to the flat mesh, but XLA decomposes
    each gradient all-reduce into an ICI phase within ``data`` and a DCN phase
    over ``dcn`` — the standard hierarchical-collective layout for multi-host
    TPU slices (scaling-book recipe; the device *order* must put same-host
    devices contiguous along ``data``, which ``jax.devices()`` guarantees).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size % (model_parallel_size * dcn_parallel_size) != 0:
        raise ValueError(
            f"{devices.size} devices not divisible by model_parallel_size={model_parallel_size}"
            f" x dcn_parallel_size={dcn_parallel_size}"
        )
    if dcn_parallel_size > 1:
        shaped = devices.reshape(dcn_parallel_size, -1, model_parallel_size)
        return Mesh(shaped, ("dcn", "data", "model"))
    return Mesh(devices.reshape(devices.size // model_parallel_size, model_parallel_size), ("data", "model"))


def data_axes(mesh: Mesh) -> tuple[str, ...]:
    """The batch-sharding axes of a mesh: ``("dcn", "data")`` on hierarchical
    meshes, ``("data",)`` otherwise."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicates every leaf across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Shards every leaf's ``axis`` over the data axes of the mesh (the
    combined ``(dcn, data)`` partition on hierarchical meshes)."""
    axes = data_axes(mesh)
    part = axes[0] if len(axes) == 1 else axes

    def _put(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim <= axis:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = [None] * leaf.ndim
        spec[axis] = part
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(_put, tree)


def collect_tp_specs(tree: Any) -> dict[str, P]:
    """Walks the pytree collecting partition specs DECLARED by modules.

    A module opts into tensor parallelism by defining ``tp_specs() ->
    {relative_path: spec_tuple}`` (see ``Mlp.tp_specs``); this assembles them
    into absolute dotted paths.  Nested declarations compose: a child module's
    declaration extends (and, on conflict, overrides) its ancestors'.
    """
    import dataclasses

    from cusrl_tpu.nn.base import Module

    specs: dict[str, P] = {}

    def walk(obj: Any, prefix: str) -> None:
        if isinstance(obj, Module):
            declare = getattr(obj, "tp_specs", None)
            if callable(declare):
                for rel, spec in declare().items():
                    path = f"{prefix}.{rel}" if prefix else rel
                    specs[path] = P(*spec)
            for field in dataclasses.fields(obj):
                if not field.metadata.get("static", False):
                    walk(getattr(obj, field.name), f"{prefix}.{field.name}" if prefix else field.name)
        elif isinstance(obj, (tuple, list)):
            for i, item in enumerate(obj):
                walk(item, f"{prefix}.{i}" if prefix else str(i))
        elif isinstance(obj, dict):
            for k, v in obj.items():
                walk(v, f"{prefix}.{k}" if prefix else str(k))
        elif dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            for field in dataclasses.fields(obj):
                walk(getattr(obj, field.name), f"{prefix}.{field.name}" if prefix else field.name)

    walk(tree, "")
    return specs


def tensor_parallel_rules() -> list[tuple[str, P]]:
    """Deprecated regex fallback, kept for API compatibility: module-declared
    specs (``collect_tp_specs``) are what ``distribute_agent`` consumes."""
    rules: list[tuple[str, P]] = []
    for layer in range(0, 64, 2):
        rules.append((rf".*\.layers\.{layer}\.weight$", P("model", None)))
        rules.append((rf".*\.layers\.{layer}\.bias$", P("model")))
    for layer in range(1, 64, 2):
        rules.append((rf".*\.layers\.{layer}\.weight$", P(None, "model")))
    return rules


def _apply_specs(tree: Any, mesh: Mesh, specs: dict[str, P]) -> Any:
    import warnings

    placements = []
    for path, leaf in tree_paths(tree):
        spec = P()
        candidate = specs.get(path)
        if candidate is not None and hasattr(leaf, "ndim"):
            ok = True
            for dim, name in enumerate(candidate):
                if name is None:
                    continue
                if dim >= leaf.ndim or leaf.shape[dim] % mesh.shape["model"] != 0:
                    ok = False
            if ok:
                spec = candidate
            else:
                warnings.warn(
                    f"tensor-parallel spec {candidate} for '{path}' (shape {getattr(leaf, 'shape', '?')}) "
                    f"does not divide over model={mesh.shape['model']}; leaving replicated"
                )
        placements.append(NamedSharding(mesh, spec))
    leaves, treedef = jax.tree.flatten(tree)
    placed = [jax.device_put(leaf, sharding) for leaf, sharding in zip(leaves, placements)]
    return jax.tree.unflatten(treedef, placed)


def distribute_agent(agent, mesh: Mesh | None = None, tensor_parallel: bool = False) -> Mesh:
    """Places the agent's state on the mesh: replicated parameters (DP), with
    optional Megatron-style sharding of MLP stacks over ``model`` (TP).

    Call once after construction; all subsequent jitted act/update calls will
    propagate these shardings and XLA will insert the collectives.
    """
    if mesh is None:
        mesh = get_mesh()
    if tensor_parallel and mesh.shape["model"] > 1:
        agent.state = _apply_specs(agent.state, mesh, collect_tp_specs(agent.state))
    else:
        agent.state = replicate(agent.state, mesh)
    if agent.actor_memory is not None:
        agent.actor_memory = shard_batch(agent.actor_memory, mesh, axis=0)
    agent._mesh = mesh
    return mesh
