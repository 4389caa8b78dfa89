"""Multi-head attention and transformer layers (counterpart of
cusrl/nn/layer/mha.py:16-391 + transformer.py:12-402).

SDPA runs as plain einsum + softmax — XLA fuses this well on TPU for the
moderate sequence lengths RL uses; the sliding-window *recurrent* attention
(the hot path) lives in nn/module/causal_attn.py.  Supports QK layer-norm and
rotary embeddings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field
from cusrl_tpu.nn.layer.encoding import RotaryEmbedding
from cusrl_tpu.nn.layer.linear import Linear, get_activation

__all__ = [
    "FeedForward",
    "MultiheadAttention",
    "MultiheadCrossAttention",
    "MultiheadSelfAttention",
    "TransformerDecoderLayer",
    "TransformerEncoderLayer",
    "scaled_dot_product_attention",
]


def scaled_dot_product_attention(q, k, v, mask=None, bias=None):
    """q [.., H, Lq, D], k/v [.., H, Lk, D]; mask broadcastable [.., H, Lq, Lk] bool."""
    scale = 1.0 / jnp.sqrt(q.shape[-1])
    scores = jnp.einsum("...qd,...kd->...qk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    weights = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        # Rows with no valid key would softmax uniform garbage; zero them.
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        weights = jnp.where(any_valid, weights, 0.0)
    return jnp.einsum("...qk,...kd->...qd", weights, v.astype(jnp.float32))


class _RmsNorm(Module):
    scale: jax.Array

    @staticmethod
    def init(dim: int) -> "_RmsNorm":
        return _RmsNorm(scale=jnp.ones(dim, jnp.float32))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        return (x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + 1e-6) * self.scale).astype(x.dtype)


class MultiheadAttention(Module):
    q_proj: Linear
    k_proj: Linear
    v_proj: Linear
    out_proj: Linear
    q_norm: _RmsNorm | None = None
    k_norm: _RmsNorm | None = None
    rope: RotaryEmbedding | None = static_field(default=None)
    num_heads: int = static_field(default=1)

    @staticmethod
    def init(
        key,
        embed_dim: int,
        num_heads: int,
        kv_dim: int | None = None,
        qk_norm: bool = False,
        rope: bool = False,
        compute_dtype: str | None = None,
    ) -> "MultiheadAttention":
        if embed_dim % num_heads:
            raise ValueError("embed_dim must be divisible by num_heads")
        kv_dim = kv_dim or embed_dim
        head_dim = embed_dim // num_heads
        keys = jax.random.split(key, 4)
        return MultiheadAttention(
            q_proj=Linear.init(keys[0], embed_dim, embed_dim, compute_dtype=compute_dtype),
            k_proj=Linear.init(keys[1], kv_dim, embed_dim, compute_dtype=compute_dtype),
            v_proj=Linear.init(keys[2], kv_dim, embed_dim, compute_dtype=compute_dtype),
            out_proj=Linear.init(keys[3], embed_dim, embed_dim, compute_dtype=compute_dtype),
            q_norm=_RmsNorm.init(head_dim) if qk_norm else None,
            k_norm=_RmsNorm.init(head_dim) if qk_norm else None,
            rope=RotaryEmbedding(dim=head_dim) if rope else None,
            num_heads=num_heads,
        )

    def _split(self, x):
        *lead, length, _ = x.shape
        return x.reshape(*lead, length, self.num_heads, -1).swapaxes(-2, -3)  # [.., H, L, D]

    def _merge(self, x):
        x = x.swapaxes(-2, -3)
        return x.reshape(*x.shape[:-2], -1)

    def project_q(self, query, q_positions=None):
        """Query projection + QK-norm + RoPE: [.., Lq, C] -> [.., H, Lq, D]."""
        q = self._split(self.q_proj(query))
        if self.q_norm is not None:
            q = self.q_norm(q)
        if self.rope is not None:
            if q_positions is None:
                q_positions = jnp.arange(q.shape[-2])
            q = self.rope(q, q_positions)
        return q

    def _fused_dot(self, x, projs):
        """One matmul against the trace-time concat of several projection
        weights (XLA does not merge parallel same-input dots itself; the
        launch/fusion boundaries of 3 separate [rows,C]@[C,C] projections are
        measurable at RL minibatch shapes).  Same numerics as Linear.__call__
        (bf16 operands, fp32 accumulation/bias, cast down).  Returns
        per-projection outputs."""
        import numpy as np

        weight_t = jnp.concatenate([p.weight.T for p in projs], axis=1)  # [in, out_total]
        bias = None
        if any(p.bias is not None for p in projs):
            bias = jnp.concatenate(
                [p.bias if p.bias is not None else jnp.zeros(p.weight.shape[0], jnp.float32) for p in projs]
            )
        dtype = projs[0].compute_dtype
        if dtype is not None:
            dtype = jnp.dtype(dtype)
            h = jnp.dot(x.astype(dtype), weight_t.astype(dtype), preferred_element_type=jnp.float32)
            if bias is not None:
                h = h + bias
            h = h.astype(dtype)
        else:
            h = jnp.dot(x.astype(jnp.float32), weight_t, preferred_element_type=jnp.float32)
            if bias is not None:
                h = h + bias
        return jnp.split(h, np.cumsum([p.weight.shape[0] for p in projs])[:-1].tolist(), axis=-1)

    def project_kv_raw(self, keyvalue, *, fused: bool = True):
        """K/V projections + K-norm, NO RoPE — the cacheable per-token part
        (positions shift as a cached token ages, so rotation is applied at
        attention time by ``rope_k``)."""
        if fused:
            k, v = self._fused_dot(keyvalue, (self.k_proj, self.v_proj))
            k, v = self._split(k), self._split(v)
        else:
            k = self._split(self.k_proj(keyvalue))
            v = self._split(self.v_proj(keyvalue))
        if self.q_norm is not None:
            k = self.k_norm(k)
        return k, v

    def project_qkv_raw(self, x, q_positions=None):
        """Self-attention fast path: q/k/v as ONE matmul; RoPE on q only
        (k stays raw for the cache)."""
        q, k, v = self._fused_dot(x, (self.q_proj, self.k_proj, self.v_proj))
        q, k, v = self._split(q), self._split(k), self._split(v)
        if self.q_norm is not None:
            q, k = self.q_norm(q), self.k_norm(k)
        if self.rope is not None:
            if q_positions is None:
                q_positions = jnp.arange(q.shape[-2])
            q = self.rope(q, q_positions)
        return q, k, v

    def rope_k(self, k, kv_positions):
        """Applies RoPE to raw keys from ``project_kv_raw`` (no-op without rope)."""
        if self.rope is None:
            return k
        return self.rope(k, kv_positions)

    def project_qkv(self, query, keyvalue=None, q_positions=None, kv_positions=None):
        """Projections + QK-norm + RoPE only: returns per-head q/k/v [.., H, L, D].
        Used by the banded/Pallas attention path, which runs its own SDPA."""
        keyvalue = query if keyvalue is None else keyvalue
        q = self.project_q(query, q_positions)
        k, v = self.project_kv_raw(keyvalue)
        if self.rope is not None:
            if kv_positions is None:
                kv_positions = jnp.arange(k.shape[-2])
            k = self.rope_k(k, kv_positions)
        return q, k, v

    def merge_output(self, out):
        """Head merge + output projection for externally computed attention."""
        return self.out_proj(self._merge(out))

    def __call__(
        self, query, keyvalue=None, mask=None, bias=None, q_positions=None, kv_positions=None,
        kv_pad_to: int | None = None,
    ):
        """query [.., Lq, C]; keyvalue [.., Lk, Ckv] (defaults to query).

        ``kv_pad_to``: lane-align the key axis AFTER projection + RoPE (the
        caller's mask must already cover the padded slots) — short key axes
        run the score/softmax/PV chain at Lk/128 lane utilization otherwise,
        and padding post-projection keeps the k/v projections and RoPE at the
        true key count."""
        q, k, v = self.project_qkv(query, keyvalue, q_positions, kv_positions)
        if kv_pad_to is not None and kv_pad_to > k.shape[-2]:
            extra = kv_pad_to - k.shape[-2]
            pad = [(0, 0)] * (k.ndim - 2) + [(0, extra), (0, 0)]
            k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        if mask is not None and mask.ndim == q.ndim - 1:
            mask = mask[..., None, :, :]  # add head axis
        out = self._merge(scaled_dot_product_attention(q, k, v, mask=mask, bias=bias))
        return self.out_proj(out)


MultiheadSelfAttention = MultiheadAttention


class MultiheadCrossAttention(MultiheadAttention):
    def __call__(self, query, keyvalue, **kwargs):
        if keyvalue is None:
            raise ValueError("Cross attention requires a key/value input")
        return super().__call__(query, keyvalue, **kwargs)


class FeedForward(Module):
    up: Linear
    down: Linear
    activation: str = static_field(default="gelu")
    glu: bool = static_field(default=False)

    @staticmethod
    def init(key, dim: int, hidden_dim: int, activation: str = "gelu", glu: bool = False, compute_dtype=None):
        k1, k2 = jax.random.split(key)
        up_dim = hidden_dim * 2 if glu else hidden_dim
        return FeedForward(
            up=Linear.init(k1, dim, up_dim, compute_dtype=compute_dtype),
            down=Linear.init(k2, hidden_dim, dim, compute_dtype=compute_dtype),
            activation=activation,
            glu=glu,
        )

    def _can_fuse(self, x) -> bool:
        """Non-GLU FFN = a 2-layer MLP chain: route large-batch TPU calls
        through the fused Pallas kernel (nn/kernels/fused_mlp.py — gelu saves
        pre-activations for its backward).  Mirrors Mlp._can_fuse."""
        from cusrl_tpu.nn.kernels.fused_mlp import kernel_mesh_status, supports_fused_mlp

        if self.glu or x.ndim < 2:
            return False
        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        if rows < 256 or jax.default_backend() != "tpu":
            return False
        allowed, _ = kernel_mesh_status(rows)
        return (
            allowed
            and supports_fused_mlp(self.activation, 2, False)
            and all(l.compute_dtype == "bfloat16" and l.bias is not None for l in (self.up, self.down))
        )

    def __call__(self, x):
        if self._can_fuse(x):
            from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp

            batch_shape = x.shape[:-1]
            out = fused_mlp(
                x.reshape(-1, x.shape[-1]),
                (self.up.weight.T, self.down.weight.T),
                (self.up.bias[None, :], self.down.bias[None, :]),
                self.activation,
                False,
            )
            return out.reshape(*batch_shape, out.shape[-1])  # bf16, same as the unfused chain
        h = self.up(x)
        if self.glu:
            a, b = jnp.split(h, 2, axis=-1)
            h = a * get_activation(self.activation)(b)
        else:
            h = get_activation(self.activation)(h)
        return self.down(h)


class _LayerNorm(Module):
    scale: jax.Array
    bias: jax.Array

    @staticmethod
    def init(dim: int) -> "_LayerNorm":
        return _LayerNorm(scale=jnp.ones(dim, jnp.float32), bias=jnp.zeros(dim, jnp.float32))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-6) * self.scale + self.bias).astype(x.dtype)


class TransformerEncoderLayer(Module):
    attention: MultiheadAttention
    feed_forward: FeedForward
    norm1: _LayerNorm
    norm2: _LayerNorm
    norm_mode: str = static_field(default="pre")  # pre | post | none

    @staticmethod
    def init(key, dim: int, num_heads: int, ff_dim: int | None = None, norm_mode: str = "pre", **attn_kwargs):
        k1, k2 = jax.random.split(key)
        return TransformerEncoderLayer(
            attention=MultiheadAttention.init(k1, dim, num_heads, **attn_kwargs),
            feed_forward=FeedForward.init(k2, dim, ff_dim or 4 * dim),
            norm1=_LayerNorm.init(dim),
            norm2=_LayerNorm.init(dim),
            norm_mode=norm_mode,
        )

    def __call__(self, x, mask=None):
        if self.norm_mode == "pre":
            x = x + self.attention(self.norm1(x), mask=mask)
            x = x + self.feed_forward(self.norm2(x))
        elif self.norm_mode == "post":
            x = self.norm1(x + self.attention(x, mask=mask))
            x = self.norm2(x + self.feed_forward(x))
        else:
            x = x + self.attention(x, mask=mask)
            x = x + self.feed_forward(x)
        return x


class TransformerDecoderLayer(Module):
    self_attention: MultiheadAttention
    cross_attention: MultiheadCrossAttention
    feed_forward: FeedForward
    norm1: _LayerNorm
    norm2: _LayerNorm
    norm3: _LayerNorm
    norm_mode: str = static_field(default="pre")

    @staticmethod
    def init(key, dim: int, num_heads: int, memory_dim: int | None = None, ff_dim: int | None = None, **kwargs):
        k1, k2, k3 = jax.random.split(key, 3)
        return TransformerDecoderLayer(
            self_attention=MultiheadAttention.init(k1, dim, num_heads, **kwargs),
            cross_attention=MultiheadCrossAttention.init(k2, dim, num_heads, kv_dim=memory_dim, **kwargs),
            feed_forward=FeedForward.init(k3, dim, ff_dim or 4 * dim),
            norm1=_LayerNorm.init(dim),
            norm2=_LayerNorm.init(dim),
            norm3=_LayerNorm.init(dim),
        )

    def __call__(self, x, memory, self_mask=None, cross_mask=None):
        x = x + self.self_attention(self.norm1(x), mask=self_mask)
        x = x + self.cross_attention(self.norm2(x), memory, mask=cross_mask)
        x = x + self.feed_forward(self.norm3(x))
        return x
