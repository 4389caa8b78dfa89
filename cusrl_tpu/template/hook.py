"""Hook system (counterpart of cusrl/template/hook.py:21-485), functional edition.

A hook IS a pytree (Module subclass): static config in ``static_field``s, trainable
modules / running statistics / mutable scalars as data fields.  Lifecycle callbacks
are *pure*: they take the current :class:`AgentState` plus the payload and return
``(new_self, payload...)`` — the composite fold threads updated hooks back into the
state, so the ENTIRE hook pipeline stays inside ``jit`` / ``lax.scan``.

Mapping from the reference's mutation-based API:

===============================  ==================================================
reference                         here
===============================  ==================================================
``register_module``               a data field holding a Module pytree
``register_stateful``             a ``frozen_field`` (travels in state, no grads)
``register_mutable``              a data field holding a 0-d array — schedules
                                  overwrite the value, no recompilation
``hook.agent``                    the ``state`` argument of each callback
``transition``/``batch`` dicts    passed and returned (immutably updated)
``agent.record(...)``             returned metrics dicts, merged by the caller
===============================  ==================================================

Lifecycle (mirrors cusrl/template/hook.py:219-356):
host-side: ``init``, ``apply_schedule``, ``should_update``, ``pre_export``/``post_export``
traced:    ``pre_act``, ``post_act``, ``post_step``, ``pre_update``, ``objective``,
           ``pre_optim``, ``post_update``
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

import jax

from cusrl_tpu.nn.base import Module, static_field

if TYPE_CHECKING:
    from cusrl_tpu.template.actor_critic import ActorCritic, AgentState

__all__ = ["Hook", "HookComposite", "camel_to_snake"]


def camel_to_snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def validate_concrete(condition_fn, value, message: str) -> None:
    """Raises ValueError when a *concrete numeric* config value violates a
    constraint.  Skipped for anything else: pytree unflattening re-invokes
    dataclass constructors with tracers, None partitions, and bool mask trees,
    where value-dependent checks are meaningless."""
    if isinstance(value, (int, float)) and not isinstance(value, bool) and not condition_fn(value):
        raise ValueError(message)


class Hook(Module):
    """Base hook. Subclasses add config/static fields and override callbacks."""

    name: str | None = static_field(default=None, kw_only=True)
    active: bool = static_field(default=True, kw_only=True)
    training_only: bool = static_field(default=False, kw_only=True)

    @property
    def hook_name(self) -> str:
        return self.name or camel_to_snake(type(self).__name__)

    def named(self, name: str) -> "Hook":
        return self.replace(name=name)

    def with_active(self, active: bool) -> "Hook":
        return self.replace(active=active)

    # -- host-side lifecycle ---------------------------------------------------

    def init(self, agent: "ActorCritic", key: jax.Array) -> "Hook":
        """Builds the hook's modules/statistics; returns the initialized hook."""
        return self

    def post_init(self, agent: "ActorCritic") -> "Hook":
        return self

    def apply_schedule(self, iteration: int, agent: "ActorCritic | None" = None) -> "Hook":
        return self

    def rollout_memory_entries(self) -> dict:
        """Transition keys this hook writes per-step recurrent memory under,
        with their CURRENT (pre-rollout) values.

        The fused scan driver uses this to reconstruct the rollout-INITIAL
        memory snapshot outside the scan and drop the per-step entries from
        the stacked transitions entirely — stacking a [N, H, W+1, D] ring
        cache for all T steps costs hundreds of MB of dead HBM writes per
        iteration (only index [0] is ever consumed; tracing showed ~25 ms/iter
        at the transformer bench config).  Hooks that do NOT implement this
        keep their per-step stacking behavior (correct, just slower)."""
        return {}

    def schedule_is_noop(self, iteration: int) -> bool:
        """True when apply_schedule(iteration) provably changes nothing.  Lets
        the packed-carry fast path skip per-iteration state synchronization;
        hooks overriding apply_schedule should override this too."""
        return type(self).apply_schedule is Hook.apply_schedule

    def should_update(self, agent: "ActorCritic") -> bool:
        return True

    def update_attribute(self, name: str, value: Any) -> "Hook":
        """Schedule entry point: overwrite a (mutable) field by name."""
        import jax.numpy as jnp

        current = getattr(self, name)
        if hasattr(current, "dtype"):
            value = jnp.asarray(value, current.dtype)
        return self.replace(**{name: value})

    def pre_export(self, agent: "ActorCritic", graph) -> None:
        pass

    def post_export(self, agent: "ActorCritic", graph) -> None:
        pass

    # -- traced lifecycle (all pure) -------------------------------------------

    def pre_act(self, state: "AgentState", transition: dict):
        return self, transition

    def post_act(self, state: "AgentState", transition: dict):
        return self, transition

    def post_step(self, state: "AgentState", transition: dict):
        return self, transition

    def pre_update(self, state: "AgentState", rollout: dict):
        """rollout: the buffer's nested data dict of [T, N, ...] arrays.
        Returns (self, rollout, metrics)."""
        return self, rollout, {}

    def objective(self, state: "AgentState", metadata: dict, batch: dict):
        """Returns (self, batch, objectives: dict[str, scalar] | None, metrics)."""
        return self, batch, None, {}

    def pre_optim(self, state: "AgentState", grads):
        """Gradient-space callback (clipping, LR overrides).
        Returns (self, state, grads, metrics); edits to state.hooks are kept,
        but the returned self wins for this hook's own slot."""
        return self, state, grads, {}

    def post_objective(self, state: "AgentState", metadata: dict, batch: dict):
        """After the optimizer step for a batch (nested-optimization stage point).
        Returns (self, state, metrics); edits to state.hooks are kept, but the
        returned self wins for this hook's own slot."""
        return self, state, {}

    def post_update(self, state: "AgentState", rollout: dict, snapshot):
        """After the optimization epochs. ``snapshot`` holds the pre-update
        (actor, critic, hooks, opt_state) for KL-based update rejection.
        Returns (self, state, metrics); edits to state.hooks are kept, but the
        returned self wins for this hook's own slot."""
        return self, state, {}


def _merge_metrics(dst: dict, src: dict) -> dict:
    for key, value in src.items():
        dst[key] = value
    return dst


class HookComposite:
    """Stateless fold of hook callbacks over an AgentState's hook tuple.

    Unlike the reference's HookComposite (itself a Hook owning sub-hooks), this
    is a *driver*: the hooks live in ``state.hooks`` so they are part of the
    differentiated/optimized pytree; the composite only orchestrates.
    """

    def __init__(self, inference_mode: bool = False):
        self.inference_mode = inference_mode

    def _active(self, hook: Hook) -> bool:
        return hook.active and not (self.inference_mode and hook.training_only)

    # Each fold returns (new_state, payload...) with updated hooks threaded in.

    def pre_act(self, state: "AgentState", transition: dict):
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            hooks[i], transition = hook.pre_act(state.replace(hooks=tuple(hooks)), transition)
        return state.replace(hooks=tuple(hooks)), transition

    def post_act(self, state: "AgentState", transition: dict):
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            hooks[i], transition = hook.post_act(state.replace(hooks=tuple(hooks)), transition)
        return state.replace(hooks=tuple(hooks)), transition

    def post_step(self, state: "AgentState", transition: dict):
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            hooks[i], transition = hook.post_step(state.replace(hooks=tuple(hooks)), transition)
        return state.replace(hooks=tuple(hooks)), transition

    def pre_update(self, state: "AgentState", rollout: dict):
        metrics: dict = {}
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            hooks[i], rollout, m = hook.pre_update(state.replace(hooks=tuple(hooks)), rollout)
            _merge_metrics(metrics, m)
        return state.replace(hooks=tuple(hooks)), rollout, metrics

    def objective(self, state: "AgentState", metadata: dict, batch: dict):
        """Returns (state, batch, objectives, metrics).

        If an earlier hook wrote ``batch["__objective_scales__"][name]`` (see
        ConditionalObjectiveActivation), hook ``name``'s losses are multiplied by
        that traced scale — the jit-friendly equivalent of the reference's
        per-batch hook activation toggling (cusrl/hook/control/condition.py)."""
        objectives: dict = {}
        metrics: dict = {}
        # Hooks mutate the batch dict; work on a shallow copy so repeated
        # invocations of this fold (grad probe + grad trace) stay idempotent.
        # ``.copy()`` (not ``dict(...)``) preserves recording views — see
        # ActorCritic._record_batch_keys.
        batch = batch.copy()
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            hooks[i], batch, obj, m = hook.objective(state.replace(hooks=tuple(hooks)), metadata, batch)
            if obj:
                scale = batch.get("__objective_scales__", {}).get(hook.hook_name)
                if scale is not None:
                    obj = {key: value * scale for key, value in obj.items()}
                for key in obj:
                    if key in objectives:
                        raise RuntimeError(f"Duplicate objective '{key}'")
                objectives.update(obj)
            _merge_metrics(metrics, m)
        return state.replace(hooks=tuple(hooks)), batch, objectives, metrics

    def pre_optim(self, state: "AgentState", grads):
        metrics: dict = {}
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            current = state.replace(hooks=tuple(hooks))
            new_hook, state, grads, m = hook.pre_optim(current, grads)
            hooks = list(state.hooks)  # keep state-level hook edits, then slot in self
            hooks[i] = new_hook
            _merge_metrics(metrics, m)
        return state.replace(hooks=tuple(hooks)), grads, metrics

    def post_objective(self, state: "AgentState", metadata: dict, batch: dict):
        metrics: dict = {}
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            current = state.replace(hooks=tuple(hooks))
            new_hook, state, m = hook.post_objective(current, metadata, batch)
            hooks = list(state.hooks)
            hooks[i] = new_hook
            _merge_metrics(metrics, m)
        return state.replace(hooks=tuple(hooks)), metrics

    def post_update(self, state: "AgentState", rollout: dict, snapshot):
        metrics: dict = {}
        hooks = list(state.hooks)
        for i, hook in enumerate(hooks):
            if not self._active(hook):
                continue
            current = state.replace(hooks=tuple(hooks))
            new_hook, state, m = hook.post_update(current, rollout, snapshot)
            hooks = list(state.hooks)
            hooks[i] = new_hook
            _merge_metrics(metrics, m)
        # Strip the shared-pass cache sentinel (hook/on_policy/stats.py) so the
        # rollout leaves the fold as a pure [T, N] data dict — generic tree-maps
        # downstream must never traverse cached module pytrees.
        rollout.pop("__post_update_kl__", None)
        return state.replace(hooks=tuple(hooks)), metrics


def find_hook(hooks: tuple[Hook, ...], name: str) -> tuple[int, Hook]:
    for index, hook in enumerate(hooks):
        if hook.hook_name == name:
            return index, hook
    raise KeyError(f"No hook named '{name}'")
