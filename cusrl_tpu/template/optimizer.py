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
    ):
        self.group_names = sorted(transforms)
        self.labels_flat = labels_flat  # path -> group name
        self.base_learning_rates = dict(base_lrs)
        masks = {g: {path: lbl == g for path, lbl in labels_flat.items()} for g in self.group_names}
        self.transform = optax.chain(*(optax.masked(transforms[g], masks[g]) for g in self.group_names))

    # -- flat view helpers -----------------------------------------------------

    def _flatten(self, tree) -> dict[str, Any]:
        return {path: leaf for path, leaf in tree_paths(tree)}

    def _unflatten_like(self, flat: dict[str, Any], like) -> Any:
        ordered = [flat[path] for path, _ in tree_paths(like)]
        return jax.tree.unflatten(jax.tree.structure(like), ordered)

    def init(self, params) -> optax.OptState:
        return self.transform.init(self._flatten(params))

    def init_learning_rates(self) -> dict[str, jax.Array]:
        return {g: jnp.asarray(lr, jnp.float32) for g, lr in self.base_learning_rates.items()}

    def apply(self, grads, opt_state, params, learning_rates: dict[str, jax.Array]):
        """Returns ``(new_params, new_opt_state)``; lr applied per group leaf."""
        flat_params = self._flatten(params)
        flat_grads = self._flatten(grads)
        updates, new_opt_state = self.transform.update(flat_grads, opt_state, flat_params)
        new_flat = {
            path: flat_params[path] + (-learning_rates[self.labels_flat[path]] * u).astype(flat_params[path].dtype)
            for path, u in updates.items()
        }
        return self._unflatten_like(new_flat, params), new_opt_state

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
    return Optimizer(transforms, labels_flat, base_lrs)
