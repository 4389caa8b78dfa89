"""Optimizer construction (counterpart of cusrl/template/optimizer.py:14-251).

Design notes (TPU-native):
* Parameters are a filtered pytree (the trainable leaves of the AgentState);
  "param groups" are defined by dotted-path prefixes over that pytree — e.g.
  ``"actor"``, ``"critic"``, ``"hooks.3.discriminator"`` — longest prefix wins,
  mirroring the reference's prefix grouping that GradientClipping and the LR
  schedules consume.
* Learning rates are *runtime arrays*, not baked into the transform: the update
  direction is computed by per-group masked optax transforms, then scaled by
  ``learning_rates[group]`` (0-d arrays living in the AgentState).  KL-adaptive
  LR schedules therefore adjust LR inside jit with zero recompilation, and
  update rejection can roll back optimizer state like any other pytree.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cusrl_tpu.nn.base import tree_paths

__all__ = ["AdamFactory", "AdamWFactory", "Optimizer", "OptimizerFactory", "SgdFactory", "build_optimizer"]


_SCALERS: dict[str, Callable[..., optax.GradientTransformation]] = {
    "adam": lambda b1=0.9, b2=0.999, eps=1e-8, **_: optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
    "adamw": lambda b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2, **_: optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.add_decayed_weights(weight_decay)
    ),
    "sgd": lambda momentum=0.0, nesterov=False, **_: (
        optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity()
    ),
    "rmsprop": lambda decay=0.99, eps=1e-8, **_: optax.scale_by_rms(decay=decay, eps=eps),
}


@dataclasses.dataclass
class OptimizerFactory:
    """Builds a named optax direction transform with prefix param groups.

    ``param_groups`` maps path prefixes to per-group overrides (``lr`` and any
    algorithm kwargs); ungrouped parameters fall into the factory's own group.
    """

    cls: str = "adam"
    lr: float = 1e-3
    kwargs: dict[str, Any] = dataclasses.field(default_factory=dict)
    param_groups: dict[str, dict[str, Any]] = dataclasses.field(default_factory=dict)

    def make_transform(self, overrides: dict[str, Any] | None = None) -> optax.GradientTransformation:
        kwargs = {**self.kwargs, **{k: v for k, v in (overrides or {}).items() if k != "lr"}}
        name = self.cls.lower()
        if name not in _SCALERS:
            raise ValueError(f"Unsupported optimizer '{self.cls}' (available: {sorted(_SCALERS)})")
        return _SCALERS[name](**kwargs)

    def group_lr(self, overrides: dict[str, Any] | None = None) -> float:
        return float((overrides or {}).get("lr", self.lr))


@dataclasses.dataclass
class AdamFactory(OptimizerFactory):
    cls: str = "adam"


@dataclasses.dataclass
class AdamWFactory(OptimizerFactory):
    cls: str = "adamw"

    def __post_init__(self):
        self.kwargs.setdefault("weight_decay", 1e-2)


@dataclasses.dataclass
class SgdFactory(OptimizerFactory):
    cls: str = "sgd"
    lr: float = 1e-2


class Optimizer:
    """Host-side optimizer facade over per-group masked transforms.

    Internally the optimizer works on a FLAT ``{dotted_path: leaf}`` dict view of
    the trainable parameters.  This keeps the optimizer state and group masks
    free of module/hook dataclass treedefs — hook *static* metadata may change
    between construction and update (e.g. post_init wiring) without invalidating
    ``opt_state``, and checkpoints of ``opt_state`` are plain path-keyed dicts.
    """

    def __init__(
        self,
        transforms: dict[str, optax.GradientTransformation],
        labels_flat: dict[str, str],
        base_lrs: dict[str, float],
        packed_adam: tuple[float, float, float] | None = None,
    ):
        self.group_names = sorted(transforms)
        self.labels_flat = labels_flat  # path -> group name
        self.base_learning_rates = dict(base_lrs)
        masks = {g: {path: lbl == g for path, lbl in labels_flat.items()} for g in self.group_names}
        self.transform = optax.chain(*(optax.masked(transforms[g], masks[g]) for g in self.group_names))
        # Packed Adam (CUSRL_TPU_PACKED_ADAM=1; default off): the whole update
        # on ONE concatenated vector.  Bit-identical to the optax chain
        # (tests/test_optimizer_packed.py) and 4x faster in isolation, but
        # slower inside the real fused update scan — see _packable_adam.
        self.packed_adam = packed_adam

    # -- flat view helpers -----------------------------------------------------

    def _flatten(self, tree) -> dict[str, Any]:
        return {path: leaf for path, leaf in tree_paths(tree)}

    def _unflatten_like(self, flat: dict[str, Any], like) -> Any:
        ordered = [flat[path] for path, _ in tree_paths(like)]
        return jax.tree.unflatten(jax.tree.structure(like), ordered)

    def init(self, params) -> optax.OptState:
        flat = self._flatten(params)
        if self.packed_adam is not None and all(
            hasattr(leaf, "dtype") and leaf.dtype == jnp.float32 for leaf in flat.values()
        ):
            return {
                "count": jnp.zeros((), jnp.int32),
                "mu": {path: jnp.zeros_like(leaf) for path, leaf in flat.items()},
                "nu": {path: jnp.zeros_like(leaf) for path, leaf in flat.items()},
            }
        self.packed_adam = None  # non-f32 leaves: keep the general optax chain
        return self.transform.init(flat)

    def init_learning_rates(self) -> dict[str, jax.Array]:
        return {g: jnp.asarray(lr, jnp.float32) for g, lr in self.base_learning_rates.items()}

    def apply(self, grads, opt_state, params, learning_rates: dict[str, jax.Array]):
        """Returns ``(new_params, new_opt_state)``; lr applied per group leaf."""
        flat_params = self._flatten(params)
        flat_grads = self._flatten(grads)
        if self.packed_adam is not None and isinstance(opt_state, dict) and "mu" in opt_state:
            new_flat, new_opt_state = self._apply_packed(flat_grads, opt_state, flat_params, learning_rates)
            return self._unflatten_like(new_flat, params), new_opt_state
        updates, new_opt_state = self.transform.update(flat_grads, opt_state, flat_params)
        new_flat = {
            path: flat_params[path] + (-learning_rates[self.labels_flat[path]] * u).astype(flat_params[path].dtype)
            for path, u in updates.items()
        }
        return self._unflatten_like(new_flat, params), new_opt_state

    def _apply_packed(self, flat_grads, opt_state, flat_params, learning_rates):
        b1, b2, eps = self.packed_adam
        paths = list(flat_params)
        shapes = [flat_params[p].shape for p in paths]
        sizes = [int(np.prod(s)) if s else 1 for s in shapes]
        offsets = np.cumsum([0] + sizes)

        def pack(flat):
            return jnp.concatenate([jnp.ravel(flat[p]) for p in paths])

        def unpack(vec):
            return {
                p: jax.lax.dynamic_slice_in_dim(vec, int(offsets[i]), sizes[i], 0).reshape(shapes[i])
                for i, p in enumerate(paths)
            }

        g = pack(flat_grads).astype(jnp.float32)
        mu = b1 * pack(opt_state["mu"]) + (1.0 - b1) * g
        nu = b2 * pack(opt_state["nu"]) + (1.0 - b2) * jnp.square(g)
        count = opt_state["count"] + 1
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - jnp.asarray(b1, jnp.float32) ** c)
        nu_hat = nu / (1.0 - jnp.asarray(b2, jnp.float32) ** c)
        update = mu_hat / (jnp.sqrt(nu_hat) + eps)
        if len(set(self.labels_flat.values())) == 1:
            lr_vec = learning_rates[self.labels_flat[paths[0]]]
        else:
            lr_vec = jnp.concatenate(
                [jnp.broadcast_to(learning_rates[self.labels_flat[p]], (sizes[i],)) for i, p in enumerate(paths)]
            )
        vec = pack(flat_params) - lr_vec * update
        return unpack(vec), {"count": count, "mu": unpack(mu), "nu": unpack(nu)}

    def group_of(self, path: str) -> str:
        return self.labels_flat.get(path, self.group_names[0])

    @property
    def labels(self):
        return self.labels_flat


def _assign_groups(paths: list[str], prefix_to_group: dict[str, str], default_group: str) -> list[str]:
    assigned = []
    for path in paths:
        best_len, group = -1, default_group
        for prefix, name in prefix_to_group.items():
            if path == prefix or path.startswith(prefix + ".") or path.startswith(prefix):
                if len(prefix) > best_len:
                    best_len, group = len(prefix), name
        assigned.append(group)
    return assigned


def build_optimizer(factory: OptimizerFactory | Mapping[str, OptimizerFactory], params) -> Optimizer:
    """Assigns every trainable leaf to a group and builds the facade.

    A single factory owns everything (group "default" + its ``param_groups``);
    a mapping ``{prefix: factory}`` splits ownership by path prefix — the
    reference's OptimizerCollection semantics (cusrl/template/optimizer.py:14-91).
    """
    paths_and_leaves = tree_paths(params)
    paths = [p for p, leaf in paths_and_leaves]

    transforms: dict[str, optax.GradientTransformation] = {}
    base_lrs: dict[str, float] = {}
    prefix_to_group: dict[str, str] = {}
    default_group = "default"

    if isinstance(factory, Mapping):
        first = True
        for prefix, sub in factory.items():
            group = prefix
            transforms[group] = sub.make_transform()
            base_lrs[group] = sub.group_lr()
            prefix_to_group[prefix] = group
            for sub_prefix, overrides in sub.param_groups.items():
                sub_group = f"{prefix}.{sub_prefix}"
                transforms[sub_group] = sub.make_transform(overrides)
                base_lrs[sub_group] = sub.group_lr(overrides)
                prefix_to_group[sub_prefix] = sub_group
            if first:
                default_group, first = group, False
    else:
        transforms[default_group] = factory.make_transform()
        base_lrs[default_group] = factory.group_lr()
        for prefix, overrides in factory.param_groups.items():
            transforms[prefix] = factory.make_transform(overrides)
            base_lrs[prefix] = factory.group_lr(overrides)
            prefix_to_group[prefix] = prefix

    groups = _assign_groups(paths, prefix_to_group, default_group)
    used = set(groups)
    transforms = {g: t for g, t in transforms.items() if g in used}
    base_lrs = {g: lr for g, lr in base_lrs.items() if g in used}

    labels_flat = dict(zip(paths, groups))
    return Optimizer(transforms, labels_flat, base_lrs, packed_adam=_packable_adam(factory))


def _packable_adam(factory) -> tuple[float, float, float] | None:
    """(b1, b2, eps) when every group is plain Adam with identical moments
    config (per-group lr differences are fine — handled by the lr vector)."""

    def moments(f: OptimizerFactory):
        return (
            float(f.kwargs.get("b1", 0.9)),
            float(f.kwargs.get("b2", 0.999)),
            float(f.kwargs.get("eps", 1e-8)),
        )

    import os

    # Default OFF: the packed update wins in isolation (0.075 vs 0.296 ms/iter,
    # benchmarks/tpu_opt_tail_probe.py) but LOSES ~0.9 ms/iter inside the real
    # fused update scan (bench 8.20M vs 9.02M steps/s) — the pack concat and
    # unpack slices are materialization boundaries that break XLA's fusion of
    # the kernel-emitted per-leaf gradients into the carry update.
    if os.environ.get("CUSRL_TPU_PACKED_ADAM", "0") != "1":
        return None
    factories = list(factory.values()) if isinstance(factory, Mapping) else [factory]
    if not factories or any(f.cls.lower() != "adam" for f in factories):
        return None
    for f in factories:
        for overrides in f.param_groups.values():
            if any(k != "lr" for k in overrides):
                return None
    configs = {moments(f) for f in factories}
    return configs.pop() if len(configs) == 1 else None
