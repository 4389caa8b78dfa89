"""Per-prefix gradient clipping (counterpart of
cusrl/hook/on_policy/gradient_clipping.py:8-84).

Operates on the gradient pytree whose dotted paths follow the
``actor... / critic... / hooks.<name>...`` naming contract (actor_critic.params_view).
Each parameter falls into the longest matching configured prefix, or the default
group.  Pre-clip global norms are recorded per group.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import static_field, tree_paths
from cusrl_tpu.template.hook import Hook

__all__ = ["GradientClipping"]


class GradientClipping(Hook):
    max_grad_norm: float | None = static_field(default=1.0)
    groups: tuple[tuple[str, float | None], ...] = static_field(default=())
    training_only: bool = static_field(default=True, kw_only=True)

    @staticmethod
    def create(max_grad_norm: float | None = 1.0, groups: dict[str, float | None] | None = None, **kwargs):
        merged = dict(groups or {})
        merged.update(kwargs)
        for prefix, limit in merged.items():
            if not prefix:
                raise ValueError("Empty prefixes not allowed; use 'max_grad_norm' for the default group")
            if limit is not None and limit < 0:
                raise ValueError(f"Group limit for '{prefix}' must be non-negative")
        if max_grad_norm is not None and max_grad_norm < 0:
            raise ValueError("'max_grad_norm' must be non-negative")
        ordered = tuple(sorted(merged.items(), key=lambda kv: len(kv[0]), reverse=True))
        return GradientClipping(max_grad_norm=max_grad_norm, groups=ordered)

    def _match(self, path: str) -> str:
        for prefix, _ in self.groups:
            if path == prefix or path.startswith(prefix + "."):
                return prefix
        return ""

    def pre_optim(self, state, grads):
        limits = dict(self.groups)
        paths = [p for p, _ in tree_paths(grads)]
        group_of = [self._match(p) for p in paths]

        leaves, treedef = jax.tree.flatten(grads)
        metrics = {}
        group_names = sorted({"", *(g for g, _ in self.groups)})
        scales: dict[str, jax.Array] = {}
        for group in group_names:
            limit = limits.get(group, self.max_grad_norm)
            members = [leaf for leaf, g in zip(leaves, group_of) if g == group and leaf is not None]
            if not members:
                continue
            sq = sum(jnp.sum(jnp.square(leaf.astype(jnp.float32))) for leaf in members)
            norm = jnp.sqrt(sq)
            metrics[f"grad_norm/{group or 'default'}"] = norm
            if limit is not None:
                scales[group] = jnp.minimum(1.0, limit / jnp.maximum(norm, 1e-12))

        clipped = [
            leaf if leaf is None or group not in scales else (leaf * scales[group]).astype(leaf.dtype)
            for leaf, group in zip(leaves, group_of)
        ]
        return self, state, jax.tree.unflatten(treedef, clipped), metrics
