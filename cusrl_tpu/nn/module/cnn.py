"""Convolutional backbone (counterpart of cusrl/nn/module/cnn.py:33-108).

2-D conv stack with shape inference, flatten + linear head, and leading-dim
folding (any ``[..., H, W, C]`` input).  Convs run in the compute dtype on the
MXU (``lax.conv_general_dilated`` with NHWC layout — TPU-native layout).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field
from cusrl_tpu.nn.layer.linear import Linear, get_activation

__all__ = ["Cnn", "CnnFactory", "Conv2d"]


class Conv2d(Module):
    weight: jax.Array  # [KH, KW, Cin, Cout]
    bias: jax.Array | None
    stride: tuple[int, int] = static_field(default=(1, 1))
    padding: str = static_field(default="VALID")
    compute_dtype: str | None = static_field(default=None)

    @staticmethod
    def init(key, in_channels, out_channels, kernel_size, stride=1, padding="VALID", compute_dtype=None):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(stride, int):
            stride = (stride, stride)
        fan_in = in_channels * kernel_size[0] * kernel_size[1]
        bound = 1.0 / jnp.sqrt(fan_in)
        wkey, bkey = jax.random.split(key)
        weight = jax.random.uniform(wkey, (*kernel_size, in_channels, out_channels), jnp.float32, -bound, bound)
        bias = jax.random.uniform(bkey, (out_channels,), jnp.float32, -bound, bound)
        return Conv2d(weight=weight, bias=bias, stride=stride, padding=padding, compute_dtype=compute_dtype)

    def __call__(self, x):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else jnp.float32
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            self.weight.astype(dtype),
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias.astype(dtype)
        return y


class Cnn(Module):
    convs: tuple[Conv2d, ...]
    head: Linear
    activation: str = static_field(default="relu")
    input_shape: tuple[int, int, int] = static_field(default=(0, 0, 0))  # (H, W, C)
    output_dim: int = static_field(default=0)

    @property
    def input_dim(self) -> int:
        h, w, c = self.input_shape
        return h * w * c

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, **kwargs):
        act = get_activation(self.activation)
        h, w, c = self.input_shape
        lead = x.shape[:-1] if x.shape[-1] == h * w * c else x.shape[: x.ndim - 3]
        x = x.reshape((-1, h, w, c))
        for conv in self.convs:
            x = act(conv(x))
        x = x.reshape(x.shape[0], -1)
        out = self.head(x.astype(jnp.float32))
        return out.reshape(*lead, self.output_dim), memory, {}


@dataclasses.dataclass
class CnnFactory(ModuleFactory):
    input_shape: tuple[int, int, int] = (64, 64, 3)  # (H, W, C)
    channels: tuple[int, ...] = (16, 32, 32)
    kernel_sizes: tuple[int, ...] = (8, 4, 3)
    strides: tuple[int, ...] = (4, 2, 1)
    activation: str = "relu"
    hidden_dim: int = 256
    compute_dtype: str | None = "default"

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> Cnn:
        from cusrl_tpu.utils.config import CONFIG

        dtype = CONFIG.compute_dtype if self.compute_dtype == "default" else self.compute_dtype
        h, w, c = self.input_shape
        if input_dim not in (h * w * c, 0):
            raise ValueError(f"input_dim {input_dim} incompatible with input_shape {self.input_shape}")
        keys = jax.random.split(key, len(self.channels) + 1)
        convs = []
        in_c = c
        shape = (h, w)
        for i, (out_c, k, s) in enumerate(zip(self.channels, self.kernel_sizes, self.strides)):
            convs.append(Conv2d.init(keys[i], in_c, out_c, k, s, compute_dtype=dtype))
            shape = tuple((d - k) // s + 1 for d in shape)
            in_c = out_c
        flat = shape[0] * shape[1] * in_c
        out_dim = output_dim or self.hidden_dim
        head = Linear.init(keys[-1], flat, out_dim)
        return Cnn(
            convs=tuple(convs),
            head=head,
            activation=self.activation,
            input_shape=self.input_shape,
            output_dim=out_dim,
        )


# Reference-style Factory attributes (cusrl module.Factory contract).
Cnn.Factory = CnnFactory
