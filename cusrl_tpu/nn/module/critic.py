"""Value function module (counterpart of cusrl/nn/module/critic.py:27-101).

The value head is always float32 (the reference computes it under disabled
autocast) — heads are ``Linear`` with ``compute_dtype=None``.  ``action_aware``
turns it into a Q-function by concatenating the action to the input.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field
from cusrl_tpu.nn.layer.linear import Linear

__all__ = ["Value", "ValueFactory"]


class Value(Module):
    backbone: Module
    head: Linear
    action_aware: bool = static_field(default=False)

    @property
    def input_dim(self) -> int:
        return self.backbone.input_dim

    @property
    def output_dim(self) -> int:
        return self.head.output_dim

    @property
    def is_recurrent(self) -> bool:
        return self.backbone.is_recurrent

    def init_memory(self, batch_size, dtype=None) -> Memory:
        return self.backbone.init_memory(batch_size) if self.backbone.is_recurrent else None

    def __call__(
        self,
        state: jax.Array,
        memory: Memory = None,
        action: jax.Array | None = None,
        *,
        sequential: bool = False,
        **kwargs,
    ):
        """Returns ``(value, new_memory, aux)`` with value computed in float32."""
        if self.action_aware:
            if action is None:
                raise ValueError("action_aware Value requires an action input")
            state = jnp.concatenate([state, action.astype(state.dtype)], axis=-1)
        latent, new_memory, backbone_aux = self.backbone(state, memory, sequential=sequential, **kwargs)
        value = self.head(latent.astype(jnp.float32))
        aux = {f"backbone.{k}": v for k, v in backbone_aux.items()}
        aux["backbone.output"] = latent
        return value, new_memory, aux

    # -- counterfactual-append evaluation (nn/base.py contract) ----------------

    @property
    def supports_next_token_eval(self) -> bool:
        return (not self.action_aware) and self.backbone.supports_next_token_eval

    def sequential_with_ctx(self, state, memory: Memory, done):
        latent, new_memory, ctx = self.backbone.sequential_with_ctx(state, memory, done)
        return self.head(latent.astype(jnp.float32)), new_memory, ctx

    def eval_next_token(self, y, ctx):
        latent = self.backbone.eval_next_token(y, ctx)
        return self.head(latent.astype(jnp.float32))


@dataclasses.dataclass
class ValueFactory:
    backbone_factory: ModuleFactory
    action_aware: bool = False

    def __call__(self, input_dim: int, value_dim: int, key: jax.Array, action_dim: int = 0) -> Value:
        backbone_key, head_key = jax.random.split(key)
        backbone_input = input_dim + (action_dim if self.action_aware else 0)
        backbone = self.backbone_factory(backbone_input, None, backbone_key)
        head = Linear.init(head_key, backbone.output_dim, value_dim)
        return Value(backbone=backbone, head=head, action_aware=self.action_aware)


# Reference-style Factory attributes (cusrl module.Factory contract).
Value.Factory = ValueFactory
