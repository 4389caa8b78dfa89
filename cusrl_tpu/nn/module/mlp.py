"""MLP backbone (counterpart of cusrl/nn/module/mlp.py:31-93).

The workhorse policy/value backbone.  Hidden matmuls run in the configured compute
dtype (bfloat16 by default on TPU — MXU-friendly); the final layer's output is
returned in the compute dtype and heads (distribution / value) cast up to float32.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field
from cusrl_tpu.nn.layer.linear import Linear, get_activation

__all__ = ["Mlp", "MlpFactory"]


def _mesh_allows_kernel(rows: int) -> bool:
    """Pallas custom calls do not auto-partition over NamedShardings.  Under a
    PURE-DP mesh the kernels now run per-shard via shard_map (explicit psum of
    weight grads — nn/kernels/fused_mlp.py), so the single-chip MFU carries to
    multi-chip DP.  Any model/other-axis sharding (TP) keeps the XLA dot chain,
    which XLA partitions itself."""
    from cusrl_tpu.nn.kernels.fused_mlp import kernel_mesh_status

    return kernel_mesh_status(rows)[0]


class Mlp(Module):
    layers: tuple[Linear, ...]
    activation: str = static_field(default="elu")
    ends_with_activation: bool = static_field(default=False)
    input_dim: int = static_field(default=0)
    output_dim: int = static_field(default=0)
    # Fused Pallas fwd+bwd kernel (nn/kernels/fused_mlp.py) — auto-engages on
    # TPU for 2-D batches.  Must be False for modules differentiated to second
    # order (e.g. the AMP discriminator's input-gradient penalty): custom_vjp
    # backward passes are not themselves differentiable.
    fused_kernel: bool = static_field(default=True)

    @property
    def activation_fn(self) -> Callable:
        return get_activation(self.activation)

    def tp_specs(self) -> dict[str, tuple]:
        """Megatron-style tensor-parallel partition declaration: even layers
        shard the output (hidden) dimension, odd layers shard the input
        dimension (XLA inserts the psum at the boundary).  Keys are paths
        relative to this module; "model" names the mesh's model axis."""
        specs: dict[str, tuple] = {}
        for i, layer in enumerate(self.layers):
            if i % 2 == 0:
                specs[f"layers.{i}.weight"] = ("model", None)
                if layer.bias is not None:
                    specs[f"layers.{i}.bias"] = ("model",)
            else:
                specs[f"layers.{i}.weight"] = (None, "model")
        return specs

    def _can_fuse(self, x: jax.Array) -> bool:
        from cusrl_tpu.nn.kernels.fused_mlp import supports_fused_mlp

        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        return (
            self.fused_kernel
            and x.ndim >= 2
            and rows >= 256
            and jax.default_backend() == "tpu"
            and _mesh_allows_kernel(rows)
            and supports_fused_mlp(self.activation, len(self.layers), self.ends_with_activation)
            and all(l.compute_dtype == "bfloat16" and l.bias is not None for l in self.layers)
        )

    def __call__(self, x: jax.Array, memory: Memory = None, *, sequential: bool = False, **kwargs):
        if self._can_fuse(x):
            from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp

            batch_shape = x.shape[:-1]
            out = fused_mlp(
                x.reshape(-1, x.shape[-1]),
                tuple(l.weight.T for l in self.layers),
                tuple(l.bias[None, :] for l in self.layers),
                self.activation,
                self.ends_with_activation,
            )
            return out.reshape(*batch_shape, out.shape[-1]), memory, {}
        act = self.activation_fn
        for index, layer in enumerate(self.layers):
            x = layer(x)
            if index < len(self.layers) - 1 or self.ends_with_activation:
                x = act(x)
        return x, memory, {}


@dataclasses.dataclass
class MlpFactory(ModuleFactory):
    """Builds an Mlp; hidden layers use ``compute_dtype``, mirroring the reference
    factory's tunables (hidden_dims, activation, trailing activation)."""

    hidden_dims: tuple[int, ...] = (256, 256)
    activation: str = "elu"
    ends_with_activation: bool = True
    bias: bool = True
    compute_dtype: str | None = "default"
    fused_kernel: bool = True

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> Mlp:
        from cusrl_tpu.utils.config import CONFIG

        compute_dtype = CONFIG.compute_dtype if self.compute_dtype == "default" else self.compute_dtype
        dims = [input_dim, *self.hidden_dims]
        if output_dim is not None:
            dims.append(output_dim)
        keys = jax.random.split(key, len(dims) - 1)
        layers = tuple(
            Linear.init(k, dims[i], dims[i + 1], bias=self.bias, compute_dtype=compute_dtype)
            for i, k in enumerate(keys)
        )
        return Mlp(
            layers=layers,
            activation=self.activation,
            ends_with_activation=self.ends_with_activation,
            input_dim=input_dim,
            output_dim=dims[-1],
            fused_kernel=self.fused_kernel,
        )


# Reference-style Factory attributes (cusrl module.Factory contract).
Mlp.Factory = MlpFactory
