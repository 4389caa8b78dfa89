"""Linear layer and activation registry.

Counterpart of cusrl/nn/layer/linear.py + activation.py, with the TPU precision
policy baked in: parameters are stored float32; when a ``compute_dtype`` (usually
bfloat16) is requested the matmul runs on the MXU in that dtype with float32
accumulation (``preferred_element_type``).  ``LinearFp32`` — the reference's fp32
island for distribution/value heads — is ``Linear`` with ``compute_dtype=None``.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field

__all__ = ["ACTIVATIONS", "Linear", "get_activation"]


ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "leaky_relu": jax.nn.leaky_relu,
    "mish": jax.nn.mish,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def get_activation(name: str | Callable | None) -> Callable:
    if callable(name):
        return name
    if name is None:
        return ACTIVATIONS["identity"]
    key = name.lower()
    if key not in ACTIVATIONS:
        raise ValueError(f"Unknown activation '{name}'")
    return ACTIVATIONS[key]


class Linear(Module):
    """y = x @ W^T + b with optional low-precision compute.

    ``compute_dtype=None`` keeps everything float32 (the fp32-island behavior of
    the reference's LinearFp32, cusrl/nn/layer/linear.py:8-16).
    """

    weight: jax.Array
    bias: jax.Array | None
    compute_dtype: str | None = static_field(default=None)

    @staticmethod
    def init(
        key: jax.Array,
        input_dim: int,
        output_dim: int,
        bias: bool = True,
        compute_dtype: str | None = None,
    ) -> "Linear":
        # Kaiming-uniform fan-in init, the conventional default for MLP policies.
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(input_dim) if input_dim > 0 else 0.0
        weight = jax.random.uniform(wkey, (output_dim, input_dim), jnp.float32, -bound, bound)
        b = jax.random.uniform(bkey, (output_dim,), jnp.float32, -bound, bound) if bias else None
        return Linear(weight=weight, bias=b, compute_dtype=compute_dtype)

    @property
    def input_dim(self) -> int:
        return self.weight.shape[1]

    @property
    def output_dim(self) -> int:
        return self.weight.shape[0]

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.compute_dtype is not None:
            dtype = jnp.dtype(self.compute_dtype)
            # bf16 inputs/weights on the MXU with fp32 accumulation, bias added in
            # fp32, then cast down so downstream layers stay in the compute dtype.
            y = jnp.dot(x.astype(dtype), self.weight.T.astype(dtype), preferred_element_type=jnp.float32)
            if self.bias is not None:
                y = y + self.bias
            return y.astype(dtype)
        y = jnp.dot(x.astype(jnp.float32), self.weight.T, preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias
        return y
