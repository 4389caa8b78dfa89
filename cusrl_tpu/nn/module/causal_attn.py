"""Sliding-window causal self-attention as a recurrent module (counterpart of
cusrl/nn/module/causal_attn.py:49-403 + nn/utils/attention.py:16-161).

The reference implements this with flex_attention BlockMasks built from done
flags plus split/pad machinery.  The TPU-native formulation is simpler: the
recurrent memory is a rolling cache of the last ``window`` *input* tokens plus a
validity mask::

    memory = {"input_cache": [N, W, C], "cache_mask": [N, W]}

Single-step attention queries the current token against cache+self; sequence
mode is a ``lax.scan`` of the SAME cell with done-driven cache resets on the
carry — so causal ∧ window ∧ same-segment constraints hold by construction and
rollout/batch consistency is structural (no mask bookkeeping at all).  Zeroing
the memory (reset_memory) invalidates the cache via the zero mask.

RoPE uses window-relative positions (rotary attention is relative by
construction); ALiBi biases by key distance.  The cache holds detached inputs,
matching the reference's detached KV cache.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field
from cusrl_tpu.nn.layer.encoding import alibi_slopes
from cusrl_tpu.nn.layer.linear import Linear
from cusrl_tpu.nn.layer.mha import FeedForward, MultiheadAttention, _LayerNorm
from cusrl_tpu.nn.layer.gate import make_gate

__all__ = [
    "CausalMultiheadSelfAttention",
    "CausalTransformerEncoderLayer",
    "CausalTransformerEncoderLayerFactory",
]


class CausalMultiheadSelfAttention(Module):
    mha: MultiheadAttention
    window: int = static_field(default=16)
    use_alibi: bool = static_field(default=False)
    input_dim: int = static_field(default=0)
    # "batched": sequence mode computes all T queries in ONE masked SDPA over
    # [cache + sequence] keys (MXU-efficient for short rollouts).
    # "banded": the Pallas flash-window kernel (nn/kernels/banded_attention.py)
    # — only the non-empty [T, BQ+W] band is computed, Θ(T·W) instead of Θ(T²);
    # the training hot path for long sequences (XLA banded fallback off-TPU).
    # "scan": sequence mode is a lax.scan of the single-step cell (the
    # definitionally-correct reference used to verify the batched/banded masks).
    # "auto": banded when the band saves ≥2× the key axis, else batched.
    sequence_mode: str = static_field(default="auto")

    is_recurrent = True

    @property
    def output_dim(self) -> int:
        return self.input_dim

    def init_memory(self, batch_size, dtype=jnp.float32) -> Memory:
        if isinstance(batch_size, int):
            batch_size = (batch_size,)
        return {
            "input_cache": jnp.zeros((*batch_size, self.window, self.input_dim), dtype),
            "cache_mask": jnp.zeros((*batch_size, self.window), dtype),
        }

    def _alibi_bias(self):
        if not self.use_alibi:
            return None
        slopes = alibi_slopes(self.mha.num_heads)  # [H]
        distance = jnp.arange(self.window + 1, 0, -1) - 1  # key at slot i is (W-i) steps back
        return -slopes[:, None, None] * distance[None, None, :]  # [H, 1, W+1]

    def _step(self, x, cache, cache_mask):
        """x [N, C]; cache [N, W, C]; returns (out [N, C], new cache, new mask)."""
        tokens = jnp.concatenate([cache, x[:, None]], axis=1)  # [N, W+1, C]
        valid = jnp.concatenate([cache_mask, jnp.ones((*x.shape[:-1], 1), cache_mask.dtype)], axis=1)
        mask = valid[:, None, :] > 0.5  # [N, 1(q), W+1]
        positions = jnp.arange(self.window + 1)
        out = self.mha(
            x[:, None],
            tokens,
            mask=mask,
            bias=self._alibi_bias(),
            q_positions=positions[-1:],
            kv_positions=positions,
        )[:, 0]
        new_cache = jax.lax.stop_gradient(tokens[:, 1:])
        new_mask = jax.lax.stop_gradient(valid[:, 1:])
        return out, new_cache, new_mask

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, done=None, **kwargs):
        if memory is None:
            batch = x.shape[1] if sequential else x.shape[0]
            memory = self.init_memory(batch)
        if not sequential:
            out, cache, cache_mask = self._step(x, memory["input_cache"], memory["cache_mask"])
            return out, {"input_cache": cache, "cache_mask": cache_mask}, {}

        if done is None:
            done = jnp.zeros((*x.shape[:2], 1), bool)

        mode = self.sequence_mode
        if mode == "auto":
            t_len, window = x.shape[0], self.window
            # "micro" (nn/kernels/micro_attention.py) is validated bit-exact on
            # Mosaic but measured perf-NEUTRAL at the RL training shapes — both
            # it and the XLA SDPA are latency-floor-bound on per-(env, head)
            # micro-matmuls (~90 ns/op; benchmarks/tpu_micro_attention_check.py)
            # — so auto keeps the XLA path, which fuses with the surrounding
            # projections.  Select sequence_mode="micro" explicitly to use it.
            block = min(128, -(-t_len // 8) * 8)
            band = (1 + -(-window // block)) * block
            mode = "banded" if band * 2 <= window + t_len else "batched"
        if mode == "micro":
            return self._sequence_micro(x, memory, done)
        if mode == "banded":
            return self._sequence_banded(x, memory, done)
        if mode == "batched":
            return self._sequence_batched(x, memory, done)

        def body(carry, xs):
            cache, cache_mask = carry
            x_t, done_t = xs
            out, cache, cache_mask = self._step(x_t, cache, cache_mask)
            keep = jnp.logical_not(done_t)  # [N, 1]
            cache = jnp.where(keep[..., None], cache, 0.0)
            cache_mask = jnp.where(keep, cache_mask, 0.0)
            return (cache, cache_mask), out

        (cache, cache_mask), outputs = jax.lax.scan(body, (memory["input_cache"], memory["cache_mask"]), (x, done))
        return outputs, {"input_cache": cache, "cache_mask": cache_mask}, {}

    def _sequence_micro(self, x, memory, done):
        """Fused short-sequence path: identical mask semantics to
        ``_sequence_batched`` (tests/test_micro_attention.py), one kernel
        instance per env block with the whole [T, S] attention in VMEM."""
        from cusrl_tpu.nn.kernels.micro_attention import micro_window_attention

        t_len, batch = x.shape[:2]
        window = self.window
        cache, cache_mask = memory["input_cache"], memory["cache_mask"]

        tokens = jnp.concatenate([cache, jnp.swapaxes(x, 0, 1)], axis=1)  # [N, W+T, C]
        done2 = done.reshape(t_len, batch)
        seg = jnp.cumsum(jnp.pad(done2.astype(jnp.int32), ((1, 0), (0, 0)))[:-1], axis=0)  # [T, N]

        q_pos = window + jnp.arange(t_len)
        k_pos = jnp.arange(window + t_len)
        q, k, v = self.mha.project_qkv(
            jnp.swapaxes(x, 0, 1), tokens, q_positions=q_pos, kv_positions=k_pos
        )  # [N, H, T|W+T, D]

        q_seg = jnp.swapaxes(seg, 0, 1)  # [N, T]
        k_seg = jnp.concatenate([jnp.zeros((batch, window), jnp.int32), q_seg], axis=1)
        k_valid = jnp.concatenate(
            [(cache_mask > 0.5).astype(jnp.int32), jnp.ones((batch, t_len), jnp.int32)], axis=1
        )
        slopes = alibi_slopes(self.mha.num_heads) if self.use_alibi else None

        out = micro_window_attention(
            q, k, v, q_seg, k_seg, k_valid, window=window, slopes=slopes
        )  # [N, H, T, D] fp32
        outputs = jnp.swapaxes(self.mha.merge_output(out), 0, 1)  # [T, N, C]

        new_cache, new_mask = self._final_memory(tokens, k_valid, k_seg, seg, done2, cache_mask)
        return outputs, {"input_cache": new_cache, "cache_mask": new_mask}, {}

    def _sequence_banded(self, x, memory, done):
        """Pallas flash-window path: same mask semantics as ``_sequence_batched``
        (verified equivalent in tests/test_banded_attention.py) but only the
        non-empty [T, BQ+W] score band is ever computed or materialized."""
        from cusrl_tpu.nn.kernels import banded_window_attention

        t_len, batch = x.shape[:2]
        window = self.window
        cache, cache_mask = memory["input_cache"], memory["cache_mask"]

        tokens = jnp.concatenate([cache, jnp.swapaxes(x, 0, 1)], axis=1)  # [N, W+T, C]
        done2 = done.reshape(t_len, batch)
        seg = jnp.cumsum(jnp.pad(done2.astype(jnp.int32), ((1, 0), (0, 0)))[:-1], axis=0)  # [T, N]

        q_pos = window + jnp.arange(t_len)
        k_pos = jnp.arange(window + t_len)
        q, k, v = self.mha.project_qkv(
            jnp.swapaxes(x, 0, 1), tokens, q_positions=q_pos, kv_positions=k_pos
        )  # [N, H, T|W+T, D]

        q_seg = jnp.swapaxes(seg, 0, 1)  # [N, T]
        k_seg = jnp.concatenate([jnp.zeros((batch, window), jnp.int32), q_seg], axis=1)
        k_valid = jnp.concatenate(
            [(cache_mask > 0.5).astype(jnp.int32), jnp.ones((batch, t_len), jnp.int32)], axis=1
        )
        slopes = alibi_slopes(self.mha.num_heads) if self.use_alibi else None

        out = banded_window_attention(
            q, k, v, q_seg, k_seg, k_valid, window=window, slopes=slopes
        )  # [N, H, T, D] fp32
        outputs = jnp.swapaxes(self.mha.merge_output(out), 0, 1)  # [T, N, C]

        new_cache, new_mask = self._final_memory(tokens, k_valid, k_seg, seg, done2, cache_mask)
        return outputs, {"input_cache": new_cache, "cache_mask": new_mask}, {}

    def _final_memory(self, tokens, k_valid, k_seg, seg, done2, cache_mask):
        """Last W combined tokens, valid iff originally valid and in the
        post-rollout episode's segment."""
        window = self.window
        final_seg = seg[-1] + done2[-1].astype(jnp.int32)  # [N]
        final_valid = (k_valid > 0) & (k_seg == final_seg[:, None])  # [N, W+T]
        new_cache = jax.lax.stop_gradient(tokens[:, -window:])
        new_mask = jax.lax.stop_gradient(final_valid[:, -window:].astype(cache_mask.dtype))
        return new_cache, new_mask

    def _sequence_batched(self, x, memory, done):
        """All T queries in one masked SDPA over [cache ++ sequence] keys.

        Mask semantics (provably identical to the scan cell):
          * window+causal: query t (combined position W+t) sees combined
            positions [t, W+t];
          * cache validity: cache slot i carries cache_mask AND belongs to the
            pre-rollout episode (segment 0);
          * segment: x[t'] visible to query t iff no done occurred in [t', t-1]
            (seg[t] = number of dones strictly before step t).
        """
        t_len, batch = x.shape[:2]
        window = self.window
        cache, cache_mask = memory["input_cache"], memory["cache_mask"]

        tokens = jnp.concatenate([cache, jnp.swapaxes(x, 0, 1)], axis=1)  # [N, W+T, C]
        done2 = done.reshape(t_len, batch)
        seg = jnp.cumsum(jnp.pad(done2.astype(jnp.int32), ((1, 0), (0, 0)))[:-1], axis=0)  # [T, N] dones before t

        q_pos = window + jnp.arange(t_len)  # combined positions of queries
        k_pos = jnp.arange(window + t_len)
        in_window = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] >= q_pos[:, None] - window)  # [T, W+T]

        # Per-instance key validity/segments in combined index space.
        k_is_cache = k_pos < window  # [W+T]
        k_seg = jnp.concatenate([jnp.zeros((window, batch), jnp.int32), seg], axis=0)  # [W+T, N]
        k_valid = jnp.concatenate([jnp.swapaxes(cache_mask, 0, 1) > 0.5, jnp.ones((t_len, batch), bool)], axis=0)

        same_seg = seg[:, None, :] == k_seg[None, :, :]  # [T, W+T, N]
        mask = in_window[:, :, None] & same_seg & k_valid[None, :, :]  # [T, W+T, N]
        mask = jnp.moveaxis(mask, -1, 0)  # [N, T, W+T]

        bias = None
        if self.use_alibi:
            slopes = alibi_slopes(self.mha.num_heads)  # [H]
            distance = (q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)  # [T, W+T]
            bias = -slopes[:, None, None] * distance[None]  # [H, T, W+T]

        # Lane-align the key axis: TPU vector registers are 128 lanes wide, so
        # a short combined key axis (e.g. W+T = 40 on the locomotion config)
        # runs every score/softmax/PV op at S/128 lane utilization AND at
        # relayout-crippled HBM bandwidth (traced at ~60-300 GB/s).  The MHA
        # pads k/v AFTER projection + RoPE (kv_pad_to), so only the masked
        # score/softmax/PV chain widens; projections stay at the true S.
        s_len = window + t_len
        s_pad = -(-s_len // 128) * 128
        if s_pad != s_len:
            extra = s_pad - s_len
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, extra)))
            if bias is not None:
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, extra)))

        out = self.mha(
            jnp.swapaxes(x, 0, 1),  # [N, T, C]
            tokens,
            mask=mask,
            bias=bias,
            q_positions=q_pos,
            kv_positions=k_pos,
            kv_pad_to=s_pad if s_pad != s_len else None,
        )  # [N, T, C]
        outputs = jnp.swapaxes(out, 0, 1)

        # Final memory: last W combined tokens, valid iff same segment as the
        # post-rollout episode and originally valid.
        final_seg = seg[-1] + done2[-1].astype(jnp.int32)  # [N]
        final_valid = k_valid & (k_seg == final_seg[None, :])  # [W+T, N]
        new_cache = jax.lax.stop_gradient(tokens[:, -window:])
        new_mask = jax.lax.stop_gradient(jnp.swapaxes(final_valid[-window:], 0, 1).astype(cache_mask.dtype))
        return outputs, {"input_cache": new_cache, "cache_mask": new_mask}, {}


class CausalTransformerEncoderLayer(Module):
    """input proj -> [norm] windowed causal attention [gate] -> [norm] FFN [gate].

    Mirrors the reference layer's pre/post/no-norm modes and gated residuals
    (causal_attn.py:262-403)."""

    input_proj: Linear | None
    attention: CausalMultiheadSelfAttention
    feed_forward: FeedForward
    norm1: _LayerNorm
    norm2: _LayerNorm
    gate1: Module
    gate2: Module
    norm_mode: str = static_field(default="pre")
    input_dim: int = static_field(default=0)

    is_recurrent = True

    @property
    def output_dim(self) -> int:
        return self.attention.input_dim

    def init_memory(self, batch_size, dtype=jnp.float32) -> Memory:
        return self.attention.init_memory(batch_size, dtype)

    def _block(self, h, memory, *, sequential, done):
        if self.norm_mode == "pre":
            attn_out, new_memory, _ = self.attention(self.norm1(h), memory, sequential=sequential, done=done)
            h = self.gate1(h, attn_out)
            h = self.gate2(h, self.feed_forward(self.norm2(h)))
        elif self.norm_mode == "post":
            attn_out, new_memory, _ = self.attention(h, memory, sequential=sequential, done=done)
            h = self.norm1(self.gate1(h, attn_out))
            h = self.norm2(self.gate2(h, self.feed_forward(h)))
        else:
            attn_out, new_memory, _ = self.attention(h, memory, sequential=sequential, done=done)
            h = self.gate1(h, attn_out)
            h = self.gate2(h, self.feed_forward(h))
        return h, new_memory

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, done=None, **kwargs):
        h = self.input_proj(x) if self.input_proj is not None else x
        h, new_memory = self._block(h, memory, sequential=sequential, done=done)
        return h, new_memory, {}


@dataclasses.dataclass
class CausalTransformerEncoderLayerFactory(ModuleFactory):
    embed_dim: int = 128
    num_heads: int = 4
    window: int = 16
    ff_dim: int | None = None
    norm_mode: str = "pre"
    gate: str | None = "residual"
    use_alibi: bool = False
    use_rope: bool = True
    qk_norm: bool = False
    compute_dtype: str | None = "default"

    @property
    def is_recurrent(self) -> bool:
        return True

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> CausalTransformerEncoderLayer:
        from cusrl_tpu.utils.config import CONFIG

        dtype = CONFIG.compute_dtype if self.compute_dtype == "default" else self.compute_dtype
        keys = jax.random.split(key, 5)
        input_proj = None
        if input_dim != self.embed_dim:
            input_proj = Linear.init(keys[0], input_dim, self.embed_dim, compute_dtype=dtype)
        attention = CausalMultiheadSelfAttention(
            mha=MultiheadAttention.init(
                keys[1],
                self.embed_dim,
                self.num_heads,
                qk_norm=self.qk_norm,
                rope=self.use_rope,
                compute_dtype=dtype,
            ),
            window=self.window,
            use_alibi=self.use_alibi,
            input_dim=self.embed_dim,
        )
        return CausalTransformerEncoderLayer(
            input_proj=input_proj,
            attention=attention,
            feed_forward=FeedForward.init(keys[2], self.embed_dim, self.ff_dim or 4 * self.embed_dim,
                                          compute_dtype=dtype),
            norm1=_LayerNorm.init(self.embed_dim),
            norm2=_LayerNorm.init(self.embed_dim),
            gate1=make_gate(self.gate, self.embed_dim, keys[3]),
            gate2=make_gate(self.gate, self.embed_dim, keys[4]),
            norm_mode=self.norm_mode,
            input_dim=input_dim,
        )


# Reference-style Factory attributes (cusrl module.Factory contract).
CausalTransformerEncoderLayer.Factory = CausalTransformerEncoderLayerFactory
