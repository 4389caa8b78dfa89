"""Nested optimization stage (counterpart of
cusrl/hook/control/optimization_stage.py:13-92).

After the main optimizer step for a batch, runs a second objective -> grad ->
clip -> step cycle over stage-scoped hooks with a SEPARATE optimizer whose state
lives inside this hook — enabling multi-phase updates (e.g. PPO then auxiliary).
Stage hooks' trainable modules are part of this hook's pytree, so they are
visible to both the stage loss and (by the path-prefix grouping) excludable from
the main optimizer's groups if desired.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import frozen_field, static_field, combine, partition
from cusrl_tpu.template.hook import Hook, find_hook
from cusrl_tpu.template.optimizer import OptimizerFactory

__all__ = ["OptimizationStage"]


class OptimizationStage(Hook):
    stage_name: str = static_field(default="stage")
    stage_hooks: tuple[Hook, ...] = ()  # trainable subtree
    optimizer_factory: OptimizerFactory = static_field(default=None)
    optimizer: Any = static_field(default=None, kw_only=True)  # host facade
    opt_state: Any = frozen_field(default=None)
    stage_learning_rates: dict[str, jax.Array] | None = frozen_field(default=None)
    training_only: bool = static_field(default=True, kw_only=True)

    @property
    def hook_name(self) -> str:
        return self.name or f"optimization_stage_{self.stage_name}"

    def init(self, agent, key):
        hooks = []
        for sub_key, hook in zip(jax.random.split(key, max(len(self.stage_hooks), 1)), self.stage_hooks):
            hooks.append(hook.init(agent, sub_key))
        return self.replace(stage_hooks=tuple(hooks))

    def post_init(self, agent):
        from cusrl_tpu.template.actor_critic import params_view
        from cusrl_tpu.template.optimizer import build_optimizer

        hooks = []
        for hook in self.stage_hooks:
            hooks.append(hook.post_init(agent))
        new_self = self.replace(stage_hooks=tuple(hooks))
        agent.update_hook(self.hook_name, new_self)  # make visible before partition
        trainable, _ = partition(params_view(agent.state))
        optimizer = build_optimizer(self.optimizer_factory, trainable)
        return new_self.replace(
            optimizer=optimizer,
            opt_state=optimizer.init(trainable),
            stage_learning_rates=optimizer.init_learning_rates(),
        )

    def schedule_is_noop(self, iteration: int) -> bool:
        return all(hook.schedule_is_noop(iteration) for hook in self.stage_hooks)

    def apply_schedule(self, iteration: int, agent=None):
        hooks = []
        changed = False
        for hook in self.stage_hooks:
            new_hook = hook.apply_schedule(iteration, agent)
            changed |= new_hook is not hook
            hooks.append(new_hook)
        return self.replace(stage_hooks=tuple(hooks)) if changed else self

    def post_objective(self, state, metadata, batch):
        from cusrl_tpu.template.actor_critic import params_view, state_with_view

        stage_metadata = {**metadata, "optimization_stage": self.hook_name}
        view = params_view(state)
        params, rest = partition(view)

        def loss_fn(p):
            st = state_with_view(state, combine(p, rest))
            me = find_hook(st.hooks, self.hook_name)[1]
            hooks = list(me.stage_hooks)
            objectives: dict = {}
            metrics: dict = {}
            b = batch
            for i, hook in enumerate(hooks):
                if not hook.active:
                    continue
                hooks[i], b, obj, m = hook.objective(st, stage_metadata, b)
                if obj:
                    objectives.update(obj)
                metrics.update(m)
            loss = (
                sum(jnp.asarray(v, jnp.float32) for v in objectives.values())
                if objectives
                else jnp.zeros((), jnp.float32)
            )
            return loss, (tuple(hooks), objectives, metrics)

        probe = loss_fn(params)[1][1]
        if not probe:  # trace-time: no stage losses -> nothing to do
            return self, state, {}

        (_, (new_stage_hooks, objectives, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_self = self.replace(stage_hooks=new_stage_hooks)

        # Stage-scoped gradient hooks (e.g. GradientClipping among stage_hooks).
        stage_hooks = list(new_self.stage_hooks)
        for i, hook in enumerate(stage_hooks):
            if not hook.active:
                continue
            stage_hooks[i], state, grads, m = hook.pre_optim(state, grads)
            metrics.update(m)
        new_self = new_self.replace(stage_hooks=tuple(stage_hooks))

        new_params, new_opt_state = self.optimizer.apply(grads, self.opt_state, params, self.stage_learning_rates)
        merged = combine(new_params, partition(params_view(state))[1])
        state = state_with_view(state, merged)
        new_self = new_self.replace(opt_state=new_opt_state)
        metrics.update({k: jax.lax.stop_gradient(v) for k, v in objectives.items()})
        return new_self, state, metrics
