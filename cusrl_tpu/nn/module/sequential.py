"""Sequential composition of backbone modules (counterpart of
cusrl/nn/module/sequential.py:30-78).

Memory is a dict keyed by stringified layer index, holding entries only for
recurrent members — matching the reference's per-layer memory dict contract.
"""

from __future__ import annotations

import dataclasses

import jax

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field

__all__ = ["Sequential", "SequentialFactory"]


class Sequential(Module):
    modules: tuple[Module, ...]

    @property
    def input_dim(self) -> int:
        return self.modules[0].input_dim

    @property
    def output_dim(self) -> int:
        return self.modules[-1].output_dim

    @property
    def is_recurrent(self) -> bool:
        return any(m.is_recurrent for m in self.modules)

    def init_memory(self, batch_size, dtype=None) -> Memory:
        memory = {str(i): m.init_memory(batch_size) for i, m in enumerate(self.modules) if m.is_recurrent}
        return memory or None

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, done=None, **kwargs):
        new_memory = {}
        aux: dict = {}
        for index, module in enumerate(self.modules):
            key = str(index)
            sub_memory = None if memory is None else memory.get(key)
            x, sub_new, sub_aux = module(x, sub_memory, sequential=sequential, done=done, **kwargs)
            if module.is_recurrent:
                new_memory[key] = sub_new
            for k, v in sub_aux.items():
                aux[f"{index}.{k}"] = v
        return x, (new_memory or None), aux

    # -- counterfactual-append contract (nn/base.py) ---------------------------

    @property
    def supports_next_token_eval(self) -> bool:
        return all(m.supports_next_token_eval for m in self.modules)

    def sequential_with_ctx(self, x, memory: Memory, done):
        new_memory = {}
        ctxs = []
        for index, module in enumerate(self.modules):
            sub_memory = None if memory is None else memory.get(str(index))
            x, sub_new, sub_ctx = module.sequential_with_ctx(x, sub_memory, done)
            if module.is_recurrent:
                new_memory[str(index)] = sub_new
            ctxs.append(sub_ctx)
        return x, (new_memory or None), tuple(ctxs)

    def eval_next_token(self, y, ctx):
        for module, sub_ctx in zip(self.modules, ctx):
            y = module.eval_next_token(y, sub_ctx)
        return y


@dataclasses.dataclass
class SequentialFactory(ModuleFactory):
    factories: tuple[ModuleFactory, ...] = ()

    @property
    def is_recurrent(self) -> bool:
        return any(f.is_recurrent for f in self.factories)

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> Sequential:
        modules = []
        dim = input_dim
        keys = jax.random.split(key, len(self.factories))
        for i, (factory, k) in enumerate(zip(self.factories, keys)):
            is_last = i == len(self.factories) - 1
            module = factory(dim, output_dim if is_last else None, k)
            modules.append(module)
            dim = module.output_dim
        return Sequential(modules=tuple(modules))


# Reference-style Factory attributes (cusrl module.Factory contract).
Sequential.Factory = SequentialFactory
