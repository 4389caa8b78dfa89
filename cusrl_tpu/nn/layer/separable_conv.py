"""Depthwise-separable 2D convolution (counterpart of
cusrl/nn/layer/separable_conv.py:7-85): depthwise conv (feature_group_count) +
1x1 pointwise projection, NHWC layout."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field

__all__ = ["SeparableConv2d"]


class SeparableConv2d(Module):
    depthwise: jax.Array  # [KH, KW, 1, Cin * multiplier]
    pointwise: jax.Array  # [1, 1, Cin * multiplier, Cout]
    bias: jax.Array | None
    stride: tuple[int, int] = static_field(default=(1, 1))
    padding: str = static_field(default="SAME")
    in_channels: int = static_field(default=0)

    @staticmethod
    def init(key, in_channels, out_channels, kernel_size, stride=1, padding="SAME", depth_multiplier=1):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(stride, int):
            stride = (stride, stride)
        dkey, pkey, bkey = jax.random.split(key, 3)
        mid = in_channels * depth_multiplier
        bound_d = 1.0 / jnp.sqrt(kernel_size[0] * kernel_size[1])
        depthwise = jax.random.uniform(dkey, (*kernel_size, 1, mid), jnp.float32, -bound_d, bound_d)
        bound_p = 1.0 / jnp.sqrt(mid)
        pointwise = jax.random.uniform(pkey, (1, 1, mid, out_channels), jnp.float32, -bound_p, bound_p)
        bias = jax.random.uniform(bkey, (out_channels,), jnp.float32, -bound_p, bound_p)
        return SeparableConv2d(
            depthwise=depthwise, pointwise=pointwise, bias=bias,
            stride=stride, padding=padding, in_channels=in_channels,
        )

    def __call__(self, x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            self.depthwise,
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.in_channels,
        )
        y = jax.lax.conv_general_dilated(
            y, self.pointwise, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias
        return y
