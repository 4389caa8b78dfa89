"""Sliding-window causal self-attention as a recurrent module (counterpart of
cusrl/nn/module/causal_attn.py:49-403 + nn/utils/attention.py:16-161).

The reference implements this with flex_attention BlockMasks built from done
flags plus split/pad machinery.  The TPU-native formulation caches the last
``window + 1`` *projected* key/value pairs in a ring buffer::

    memory = {
        "k_cache": [N, H, P, D],   # pre-RoPE keys (P = window + 1 ring slots)
        "v_cache": [N, H, P, D],
        "cache_mask": [N, P],      # per-slot validity
        "cursor": [] int32,        # GLOBAL next-write slot (see below)
    }

Single-step attention projects ONLY the new token's k/v, writes them at
``cursor`` (one ``[N, 1, ...]`` dynamic-update-slice — the previous
input-cache design rolled the whole ``[N, W, C]`` buffer with a concat+slice
every step, measured ~29 ms/iter of pure HBM rewrites at the transformer bench
config), and attends over the ring.  Because a slot is overwritten exactly
when its token leaves the window, validity masking alone enforces the window
constraint; RoPE positions derive from per-slot ages ``(cursor - i) mod P``
(rotary attention is relative by construction) and keys are cached PRE-RoPE so
a token's rotation can change as it ages.  ALiBi biases by age directly.

The cursor is a rank-0 GLOBAL leaf: done-driven resets zero the per-env mask
(invalidating the cache) but never the cursor (``reset_memory`` skips rank-0
leaves), so all envs share one write phase and the update slice stays a single
dynamic_update_slice instead of a per-env scatter.  When the memory is stored
into a transition it travels as a broadcast ``[N]`` vector
(``storable_memory``); consumers re-read it via ``reshape(-1)[0]``.

Sequence mode unrolls the ring chronologically once per call and computes all
T queries against [cache ++ sequence] keys (batched/banded/lane paths); the
``lax.scan`` of the single-step cell remains as the definitionally-correct
reference mode.  Caching projected (and detached) k/v matches the reference's
detached KV-cache semantics (cusrl/nn/module/causal_attn.py:129-180).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field
from cusrl_tpu.nn.layer.encoding import alibi_slopes
from cusrl_tpu.nn.layer.gate import make_gate
from cusrl_tpu.nn.layer.linear import Linear
from cusrl_tpu.nn.layer.mha import FeedForward, MultiheadAttention, _LayerNorm, scaled_dot_product_attention

__all__ = [
    "CausalMultiheadSelfAttention",
    "CausalTransformerEncoderLayer",
    "CausalTransformerEncoderLayerFactory",
    "fused_pair_sequence",
]


def _cursor_scalar(cursor):
    """Global cursor in any stored form ([] live, [N] transition, [B..] batch)."""
    return jnp.reshape(cursor, (-1,))[0] if cursor.ndim else cursor


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

    @property
    def _ring_slots(self) -> int:
        return self.window + 1

    def init_memory(self, batch_size, dtype=None) -> Memory:
        if isinstance(batch_size, int):
            batch_size = (batch_size,)
        heads = self.mha.num_heads
        head_dim = self.input_dim // heads
        slots = self._ring_slots
        if dtype is None:
            # Cache k/v in the projections' OUTPUT dtype (usually bf16): the
            # stored values are exactly what project_kv_raw produces, so this
            # is lossless — and halves the ring's HBM footprint in the rollout
            # carry (2 × [N, H, W+1, D] per backbone).
            dtype = jnp.dtype(self.mha.k_proj.compute_dtype or jnp.float32)
        return {
            "k_cache": jnp.zeros((*batch_size, heads, slots, head_dim), dtype),
            "v_cache": jnp.zeros((*batch_size, heads, slots, head_dim), dtype),
            "cache_mask": jnp.zeros((*batch_size, slots), jnp.float32),
            "cursor": jnp.zeros((), jnp.int32),
        }

    # -- single step (ring write + masked SDPA over the ring) ------------------

    def _step(self, x, memory):
        """x [N, C]; returns (out [N, C], new ring memory)."""
        slots = self._ring_slots
        k_cache, v_cache = memory["k_cache"], memory["v_cache"]
        mask, cursor = memory["cache_mask"], _cursor_scalar(memory["cursor"])

        q, k_new, v_new = self.mha.project_qkv_raw(
            x[:, None], q_positions=jnp.full((1,), self.window, jnp.int32)
        )  # [N, H, 1, D], q already RoPE'd at position W
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), (0, 0, cursor, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), (0, 0, cursor, 0))
        mask = jax.lax.dynamic_update_slice(mask, jnp.ones((x.shape[0], 1), mask.dtype), (0, cursor))

        ages = jnp.mod(cursor - jnp.arange(slots), slots)  # [P]; 0 == current token
        k_rot = self.mha.rope_k(k_cache, self.window - ages)
        bias = None
        if self.use_alibi:
            slopes = alibi_slopes(self.mha.num_heads)  # [H]
            bias = -slopes[:, None, None] * ages[None, None, :].astype(jnp.float32)  # [H, 1, P]
        out = scaled_dot_product_attention(
            q, k_rot, v_cache, mask=(mask > 0.5)[:, None, None, :], bias=bias
        )  # [N, H, 1, D]
        out = self.mha.merge_output(out)[:, 0]

        new_memory = {
            "k_cache": jax.lax.stop_gradient(k_cache),
            "v_cache": jax.lax.stop_gradient(v_cache),
            "cache_mask": mask,
            "cursor": jnp.broadcast_to(jnp.mod(cursor + 1, slots), memory["cursor"].shape),
        }
        return out, new_memory

    def step_core(self, q, k_new, v_new, memory):
        """Ring write + masked SDPA for pre-projected single-step q/k/v
        (``[N, H, 1, D]``, q already RoPE'd at position W, k raw) — the
        attention middle of the fused-block STEP path.  Returns the merged
        heads WITHOUT the out-projection (that lives in the post kernel)."""
        slots = self._ring_slots
        k_cache, v_cache = memory["k_cache"], memory["v_cache"]
        mask, cursor = memory["cache_mask"], _cursor_scalar(memory["cursor"])
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), (0, 0, cursor, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), (0, 0, cursor, 0))
        mask = jax.lax.dynamic_update_slice(mask, jnp.ones((q.shape[0], 1), mask.dtype), (0, cursor))

        ages = jnp.mod(cursor - jnp.arange(slots), slots)
        k_rot = self.mha.rope_k(k_cache, self.window - ages)
        bias = None
        if self.use_alibi:
            slopes = alibi_slopes(self.mha.num_heads)
            bias = -slopes[:, None, None] * ages[None, None, :].astype(jnp.float32)
        out = scaled_dot_product_attention(
            q, k_rot, v_cache, mask=(mask > 0.5)[:, None, None, :], bias=bias
        )
        merged = self.mha._merge(out)[:, 0]  # [N, E] fp32

        new_memory = {
            "k_cache": jax.lax.stop_gradient(k_cache),
            "v_cache": jax.lax.stop_gradient(v_cache),
            "cache_mask": mask,
            "cursor": jnp.broadcast_to(jnp.mod(cursor + 1, slots), memory["cursor"].shape),
        }
        return merged, new_memory

    # -- shared sequence-mode plumbing -----------------------------------------

    def _unrolled_cache(self, memory):
        """Ring -> chronological last-W cache: (k_raw [N, H, W, D], v, mask [N, W])."""
        slots = self._ring_slots
        cursor = _cursor_scalar(memory["cursor"])
        # Slot ``cursor`` holds the oldest entry (next overwrite target); the
        # chronological last-W tokens are slots cursor+1 .. cursor+W.
        idx = jnp.mod(cursor + 1 + jnp.arange(self.window), slots)  # [W] oldest -> newest
        k = jnp.take(memory["k_cache"], idx, axis=2)
        v = jnp.take(memory["v_cache"], idx, axis=2)
        mask = jnp.take(memory["cache_mask"], idx, axis=1)
        return k, v, mask

    def _sequence_qkv(self, x, memory):
        """Common prep for all whole-sequence paths.

        Returns (q [N, H, T, D], k_rot/v [N, H, W+T, D], k_raw (pre-RoPE),
        k_valid [N, W+T] int, k_seg [N, W+T], q_seg [N, T], done2 [T, N]).
        """
        t_len, batch = x.shape[:2]
        window = self.window
        x_nt = jnp.swapaxes(x, 0, 1)  # [N, T, C]

        k_cache, v_cache, cache_mask = self._unrolled_cache(memory)
        q_pos = window + jnp.arange(t_len)
        kv_pos = jnp.arange(window + t_len)
        # q/k/v of the live sequence as ONE fused matmul (q already RoPE'd).
        q, k_seq, v_seq = self.mha.project_qkv_raw(x_nt, q_positions=q_pos)  # [N, H, T, D]
        k_raw = jnp.concatenate([k_cache.astype(jnp.promote_types(k_cache.dtype, k_seq.dtype)),
                                 k_seq.astype(jnp.promote_types(k_cache.dtype, k_seq.dtype))], axis=2)
        v_all = jnp.concatenate([v_cache.astype(jnp.promote_types(v_cache.dtype, v_seq.dtype)),
                                 v_seq.astype(jnp.promote_types(v_cache.dtype, v_seq.dtype))], axis=2)
        k_rot = self.mha.rope_k(k_raw, kv_pos)

        return q, k_rot, v_all, k_raw, cache_mask, q_pos, kv_pos

    def _segments(self, done, t_len, batch):
        done2 = done.reshape(t_len, batch)
        seg = jnp.cumsum(jnp.pad(done2.astype(jnp.int32), ((1, 0), (0, 0)))[:-1], axis=0)  # [T, N] dones before t
        return done2, seg

    def _final_memory(self, k_raw, v_all, k_valid, k_seg, seg, done2, memory):
        """Ring-form final memory: last P combined tokens chronologically with
        cursor = 0 (slot 0 = oldest = next overwrite), valid iff originally
        valid and in the post-rollout episode's segment."""
        slots = self._ring_slots
        final_seg = seg[-1] + done2[-1].astype(jnp.int32)  # [N]
        final_valid = (k_valid > 0) & (k_seg == final_seg[:, None])  # [N, W+T]
        mask_dtype = memory["cache_mask"].dtype
        new_memory = {
            "k_cache": jax.lax.stop_gradient(k_raw[:, :, -slots:].astype(memory["k_cache"].dtype)),
            "v_cache": jax.lax.stop_gradient(v_all[:, :, -slots:].astype(memory["v_cache"].dtype)),
            "cache_mask": jax.lax.stop_gradient(final_valid[:, -slots:].astype(mask_dtype)),
            "cursor": jnp.broadcast_to(jnp.zeros((), jnp.int32), memory["cursor"].shape),
        }
        return new_memory

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, done=None,
                 collect_next_ctx: bool = False, **kwargs):
        if memory is None:
            batch = x.shape[1] if sequential else x.shape[0]
            memory = self.init_memory(batch)
        if not sequential:
            return (*self._step(x, memory), {})

        if done is None:
            done = jnp.zeros((*x.shape[:2], 1), bool)

        mode = self.sequence_mode
        if collect_next_ctx and mode == "scan":
            # The scan cell has no whole-sequence key tensors to expose; the
            # batched path is equality-tested against it and provides them.
            mode = "batched"
        if mode == "auto":
            t_len, window = x.shape[0], self.window
            # Short-T training shapes (the RL hot path) use the cross-env
            # "lane" kernel on TPU: per-env attention problems are far below
            # one MXU tile, so the XLA SDPA and per-env-grid kernels are bound
            # by per-micro-op latency (~90 ns/op — the round-3 "micro" kernel
            # hit the same floor and was removed once lane superseded it) and
            # by padded-score HBM materialization.  Long sequences go to the
            # banded flash kernel; otherwise the batched masked SDPA.
            # Pallas custom calls do not auto-partition over NamedShardings:
            # under any ambient mesh the auto path keeps the XLA chain (the
            # same rule as the fused-MLP kernels; explicit sequence_mode
            # overrides are the user's responsibility).
            in_mesh = False
            try:
                amb = jax.sharding.get_abstract_mesh()
                in_mesh = amb is not None and not getattr(amb, "empty", True)
            except Exception:  # noqa: BLE001 - conservative under exotic contexts
                in_mesh = False
            if t_len <= 64 and jax.default_backend() == "tpu" and not in_mesh:
                mode = "lane"
            else:
                block = min(128, -(-t_len // 8) * 8)
                band = (1 + -(-window // block)) * block
                mode = "banded" if (band * 2 <= window + t_len and not in_mesh) else "batched"
        if mode in ("banded", "lane"):
            return self._sequence_kernel(x, memory, done, kernel=mode, collect_ctx=collect_next_ctx)
        if mode == "batched":
            return self._sequence_batched(x, memory, done, collect_ctx=collect_next_ctx)

        def body(carry, xs):
            memory_t = carry
            x_t, done_t = xs
            out, memory_t = self._step(x_t, memory_t)
            keep = jnp.logical_not(done_t)  # [N, 1]
            memory_t = {
                "k_cache": jnp.where(keep[..., None, None], memory_t["k_cache"], 0.0),
                "v_cache": jnp.where(keep[..., None, None], memory_t["v_cache"], 0.0),
                "cache_mask": jnp.where(keep, memory_t["cache_mask"], 0.0),
                "cursor": memory_t["cursor"],
            }
            return memory_t, out

        final_memory, outputs = jax.lax.scan(body, memory, (x, done))
        return outputs, final_memory, {}

    def _sequence_kernel(self, x, memory, done, *, kernel: str, collect_ctx: bool = False):
        """Pallas flash paths (banded / lane): same mask semantics as
        ``_sequence_batched`` (tests/test_banded_attention.py,
        tests/test_lane_attention.py) with only the non-empty band computed."""
        import os

        # CUSRL_TPU_LANE_EM=1: env-minor end-to-end variant of the lane path.
        # Measured 1.7 ms/iter SLOWER at the bench config (69.41 vs 67.74,
        # same-session A/B) — XLA schedules the wrapper's transposes better
        # than the [3E, C]@[C, T·B] projection layouts.  Kept default-off for
        # larger-embed/multi-layer configs (docs/ROADMAP.md option ledger).
        if (kernel == "lane" and self.mha.q_norm is None and not collect_ctx
                and os.environ.get("CUSRL_TPU_LANE_EM", "0") == "1"):
            return self._sequence_lane_em(x, memory, done)
        t_len, batch = x.shape[:2]
        window = self.window
        q, k_rot, v_all, k_raw, cache_mask, _, _ = self._sequence_qkv(x, memory)
        done2, seg = self._segments(done, t_len, batch)

        q_seg = jnp.swapaxes(seg, 0, 1)  # [N, T]
        k_seg = jnp.concatenate([jnp.zeros((batch, window), jnp.int32), q_seg], axis=1)
        k_valid = jnp.concatenate(
            [(cache_mask > 0.5).astype(jnp.int32), jnp.ones((batch, t_len), jnp.int32)], axis=1
        )
        slopes = alibi_slopes(self.mha.num_heads) if self.use_alibi else None

        if kernel == "lane":
            from cusrl_tpu.nn.kernels.lane_attention import lane_window_attention

            out = lane_window_attention(q, k_rot, v_all, q_seg, k_seg, k_valid, window=window, slopes=slopes)
        else:
            from cusrl_tpu.nn.kernels import banded_window_attention

            out = banded_window_attention(q, k_rot, v_all, q_seg, k_seg, k_valid, window=window, slopes=slopes)
        outputs = jnp.swapaxes(self.mha.merge_output(out), 0, 1)  # [T, N, C]

        new_memory = self._final_memory(k_raw, v_all, k_valid, k_seg, seg, done2, memory)
        aux = {}
        if collect_ctx:
            aux["next_ctx"] = (k_rot, v_all, k_valid, k_seg, q_seg)
        return outputs, new_memory, aux

    def sequence_core(self, qkv_flat, memory, done, t_len: int, batch: int, *, collect_ctx: bool = False):
        """Attention middle for the fused-block path: pre-projected fused
        ``qkv_flat [T·N, 3E]`` (bf16, pre-RoPE) in, merged-heads attention out
        ``[T·N, E]`` fp32 (NO out-projection — that lives in the post kernel,
        nn/kernels/fused_block.py) plus the ring-form final memory.

        Same mask/cache semantics as ``_sequence_kernel`` (which projects
        internally); kernel choice is lane for short T, banded otherwise.
        """
        import os

        # Default OFF: the env-minor shortcut measured 1.767M vs 1.798M
        # steps/s on the transformer bench — the generic path's two-hop
        # transposes fuse into XLA's neighbors while the em path's own
        # pads/cache-transposes and materialized fp32 output transpose do not
        # (the same verdict as the round-4 CUSRL_TPU_LANE_EM experiment).
        # Kept as an equality-tested option (tests/test_attention.py).
        em_mode = os.environ.get("CUSRL_TPU_SEQCORE_EM", "0").lower()
        if (
            not collect_ctx
            and t_len <= 64
            and self.mha.q_norm is None
            and em_mode not in ("0", "")
            and (em_mode == "force" or jax.default_backend() == "tpu")
        ):
            return self._sequence_core_em(qkv_flat, memory, done, t_len, batch)

        window = self.window
        heads = self.mha.num_heads
        head_dim = self.input_dim // heads
        embed = self.input_dim

        def to_heads(cols):
            # Narrow lane slice of the flat [T·N, 3E] tensor, then the layout
            # transform — slicing the packed [3, N, H, T, D] tensor instead
            # traced at ~2.8 ms/iter of squeeze copies at the bench shapes.
            part = qkv_flat[:, cols : cols + embed].reshape(t_len, batch, heads, head_dim)
            return jnp.transpose(part, (1, 2, 0, 3))  # [N, H, T, D]

        q, k_seq, v_seq = to_heads(0), to_heads(embed), to_heads(2 * embed)
        q_pos = window + jnp.arange(t_len)
        kv_pos = jnp.arange(window + t_len)
        if self.mha.rope is not None:
            q = self.mha.rope(q, q_pos)

        k_cache, v_cache, cache_mask = self._unrolled_cache(memory)
        promo = jnp.promote_types(k_cache.dtype, k_seq.dtype)
        k_raw = jnp.concatenate([k_cache.astype(promo), k_seq.astype(promo)], axis=2)
        v_all = jnp.concatenate([v_cache.astype(promo), v_seq.astype(promo)], axis=2)
        k_rot = self.mha.rope_k(k_raw, kv_pos)

        done2, seg = self._segments(done, t_len, batch)
        q_seg = jnp.swapaxes(seg, 0, 1)  # [N, T]
        k_seg = jnp.concatenate([jnp.zeros((batch, window), jnp.int32), q_seg], axis=1)
        k_valid = jnp.concatenate(
            [(cache_mask > 0.5).astype(jnp.int32), jnp.ones((batch, t_len), jnp.int32)], axis=1
        )
        slopes = alibi_slopes(heads) if self.use_alibi else None

        if t_len <= 64:
            from cusrl_tpu.nn.kernels.lane_attention import lane_window_attention

            out = lane_window_attention(q, k_rot, v_all, q_seg, k_seg, k_valid, window=window, slopes=slopes)
        else:
            from cusrl_tpu.nn.kernels import banded_window_attention

            out = banded_window_attention(q, k_rot, v_all, q_seg, k_seg, k_valid, window=window, slopes=slopes)
        merged = self.mha._merge(out)  # [N, T, E] fp32
        merged_flat = jnp.swapaxes(merged, 0, 1).reshape(t_len * batch, self.input_dim)
        new_memory = self._final_memory(k_raw, v_all, k_valid, k_seg, seg, done2, memory)
        if collect_ctx:
            return merged_flat, new_memory, (k_rot, v_all, k_valid, k_seg, q_seg)
        return merged_flat, new_memory

    def _sequence_core_em(self, qkv_flat, memory, done, t_len: int, batch: int):
        """Env-minor attention middle for the fused-block path.

        The generic ``sequence_core`` hops ``[T·N, 3E] -> [N, H, T, D]`` per
        component and then the lane wrapper transposes AGAIN to the kernel's
        ``[H, D, T, N]`` layout (plus the inverse pair on the output) — pure
        layout copies that traced at ~2.5 ms/iter across the update's 20
        minibatch steps at the bench shapes.  This path does ONE transpose per
        component into env-minor, runs RoPE/cache/masks there (the
        ``_sequence_lane_em`` machinery), and one transpose back on the merged
        output.  Same math as the generic path (equality-tested in
        tests/test_attention.py)."""
        from cusrl_tpu.nn.kernels.lane_attention import _lane_em_op, _round_up

        window = self.window
        heads = self.mha.num_heads
        embed = self.input_dim
        head_dim = embed // heads

        qkv5 = qkv_flat.reshape(t_len, batch, 3, heads, head_dim)
        q_em = jnp.transpose(qkv5[:, :, 0], (2, 3, 0, 1))  # [H, D, T, B]
        k_seq = jnp.transpose(qkv5[:, :, 1], (2, 3, 0, 1))
        v_seq = jnp.transpose(qkv5[:, :, 2], (2, 3, 0, 1))

        k_cache, v_cache, cache_mask = self._unrolled_cache(memory)  # [B, H, W, D]
        kc_em = jnp.transpose(k_cache, (1, 3, 2, 0))  # [H, D, W, B]
        vc_em = jnp.transpose(v_cache, (1, 3, 2, 0))
        promo = jnp.promote_types(kc_em.dtype, k_seq.dtype)
        k_raw = jnp.concatenate([kc_em.astype(promo), k_seq.astype(promo)], axis=2)  # [H, D, S, B]
        v_all = jnp.concatenate([vc_em.astype(promo), v_seq.astype(promo)], axis=2)

        q_pos = window + jnp.arange(t_len)
        kv_pos = jnp.arange(window + t_len)
        q_em = self._rope_em(q_em, q_pos)
        k_rot = self._rope_em(k_raw, kv_pos)

        done2, seg = self._segments(done, t_len, batch)  # seg [T, B]
        t8 = _round_up(t_len, 8)
        s8 = window + t8
        s_len = window + t_len
        import os

        env_block = os.environ.get("CUSRL_TPU_LANE_BLOCK")
        lane_block = int(env_block) if env_block else (256 if t_len <= 32 and window <= 32 else 128)
        b_pad = _round_up(batch, lane_block)

        def pad_em(a, time_to):
            return jnp.pad(a, ((0, 0), (0, 0), (0, time_to - a.shape[2]), (0, b_pad - batch)))

        q_seg_em = jnp.pad(seg.astype(jnp.int32), ((0, t8 - t_len), (0, b_pad - batch)), constant_values=-2)
        k_seg_full = jnp.concatenate([jnp.zeros((window, batch), jnp.int32), seg], axis=0)  # [S, B]
        k_seg_em = jnp.pad(k_seg_full, ((0, s8 - s_len), (0, b_pad - batch)), constant_values=-1)
        k_valid_full = jnp.concatenate(
            [(jnp.swapaxes(cache_mask, 0, 1) > 0.5).astype(jnp.int32), jnp.ones((t_len, batch), jnp.int32)],
            axis=0,
        )
        k_valid_em = jnp.pad(k_valid_full, ((0, s8 - s_len), (0, b_pad - batch)))

        slopes = alibi_slopes(heads) if self.use_alibi else None
        slopes_t = None if slopes is None else tuple(float(s) for s in jax.device_get(slopes))
        with jax.named_scope("lane_attn_em"):
            out_em = _lane_em_op(
                pad_em(q_em, t8), pad_em(k_rot, s8), pad_em(v_all, s8),
                q_seg_em, k_seg_em, k_valid_em, window, slopes_t, lane_block,
            )  # [H, D, T8, Bp] fp32

        # (H, D) flatten == the head-major feature order of mha._merge; rows
        # come out (t-major, env-minor) == swapaxes(.., 0, 1).reshape(rows, E).
        merged_flat = out_em[:, :, :t_len, :batch].reshape(embed, t_len * batch).T

        slots = self._ring_slots
        k_tail = jnp.transpose(k_raw[:, :, -slots:], (3, 0, 2, 1))  # [B, H, P, D]
        v_tail = jnp.transpose(v_all[:, :, -slots:], (3, 0, 2, 1))
        k_valid_nt = jnp.swapaxes(k_valid_full, 0, 1)  # [B, S]
        k_seg_nt = jnp.swapaxes(k_seg_full, 0, 1)
        final_seg = seg[-1] + done2[-1].astype(jnp.int32)
        final_valid = (k_valid_nt > 0) & (k_seg_nt == final_seg[:, None])
        new_memory = {
            "k_cache": jax.lax.stop_gradient(k_tail.astype(memory["k_cache"].dtype)),
            "v_cache": jax.lax.stop_gradient(v_tail.astype(memory["v_cache"].dtype)),
            "cache_mask": jax.lax.stop_gradient(
                final_valid[:, -slots:].astype(memory["cache_mask"].dtype)
            ),
            "cursor": jnp.broadcast_to(jnp.zeros((), jnp.int32), memory["cursor"].shape),
        }
        return merged_flat, new_memory

    def _rope_em(self, x_em, positions):
        """RoPE in env-minor layout: ``x_em [H, D, L, B]``, positions ``[L]``.
        Same half-split pairing as RotaryEmbedding (fp32 internals)."""
        rope = self.mha.rope
        if rope is None:
            return x_em
        angles = rope._angles(positions)  # [L, half]
        cos = jnp.cos(angles).T[None, :, :, None]  # [1, half, L, 1]
        sin = jnp.sin(angles).T[None, :, :, None]
        half = x_em.shape[1] // 2
        x32 = x_em.astype(jnp.float32)
        x1, x2 = x32[:, :half], x32[:, half:]
        rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=1)
        return rotated.astype(x_em.dtype)

    def _sequence_lane_em(self, x, memory, done):
        """Env-minor end-to-end lane path: projections write ``[H, D, T, B]``
        directly (one ``[C, T·B]`` input transpose feeds q/k/v as a single
        matmul; the out-projection consumes ``[E, T·B]`` and one transpose
        restores ``[T, B, E]``).  The generic path's per-tensor
        transpose/split/squeeze soup around the kernel traced at ~8 ms/iter
        at the bench config.  Same math as the wrapper path (covered by the
        lane/scan consistency tests)."""
        from cusrl_tpu.nn.kernels.lane_attention import _lane_em_op, _round_up

        t_len, batch = x.shape[:2]
        window = self.window
        mha = self.mha
        heads = mha.num_heads
        embed = self.input_dim
        head_dim = embed // heads

        # Fused q/k/v projection straight into env-minor layout (weights are
        # stored [out, in], so the concat IS the left-multiplier).
        w = jnp.concatenate([mha.q_proj.weight, mha.k_proj.weight, mha.v_proj.weight], axis=0)
        bias = None
        if any(p.bias is not None for p in (mha.q_proj, mha.k_proj, mha.v_proj)):
            bias = jnp.concatenate(
                [p.bias if p.bias is not None else jnp.zeros(embed, jnp.float32)
                 for p in (mha.q_proj, mha.k_proj, mha.v_proj)]
            )
        xt = x.reshape(t_len * batch, x.shape[-1]).T  # [C, T·B]
        dtype = mha.q_proj.compute_dtype
        if dtype is not None:
            dtype = jnp.dtype(dtype)
            h = jnp.dot(w.astype(dtype), xt.astype(dtype), preferred_element_type=jnp.float32)
            if bias is not None:
                h = h + bias[:, None]
            h = h.astype(dtype)
        else:
            h = jnp.dot(w, xt.astype(jnp.float32), preferred_element_type=jnp.float32)
            if bias is not None:
                h = h + bias[:, None]
        qkv = h.reshape(3, heads, head_dim, t_len, batch)
        q_em, k_seq, v_seq = qkv[0], qkv[1], qkv[2]

        # Chronological cache in env-minor layout.
        k_cache, v_cache, cache_mask = self._unrolled_cache(memory)  # [B, H, W, D]
        kc_em = jnp.transpose(k_cache, (1, 3, 2, 0))  # [H, D, W, B]
        vc_em = jnp.transpose(v_cache, (1, 3, 2, 0))
        promo = jnp.promote_types(kc_em.dtype, k_seq.dtype)
        k_raw = jnp.concatenate([kc_em.astype(promo), k_seq.astype(promo)], axis=2)  # [H, D, S, B]
        v_all = jnp.concatenate([vc_em.astype(promo), v_seq.astype(promo)], axis=2)

        q_pos = window + jnp.arange(t_len)
        kv_pos = jnp.arange(window + t_len)
        q_em = self._rope_em(q_em, q_pos)
        k_rot = self._rope_em(k_raw, kv_pos)

        done2, seg = self._segments(done, t_len, batch)  # seg [T, B]
        t8 = _round_up(t_len, 8)
        s8 = window + t8
        b_pad = _round_up(batch, 128)
        s_len = window + t_len

        def pad_em(a, time_to):
            return jnp.pad(a, ((0, 0), (0, 0), (0, time_to - a.shape[2]), (0, b_pad - batch)))

        q_seg_em = jnp.pad(seg.astype(jnp.int32), ((0, t8 - t_len), (0, b_pad - batch)), constant_values=-2)
        k_seg_full = jnp.concatenate([jnp.zeros((window, batch), jnp.int32), seg], axis=0)  # [S, B]
        k_seg_em = jnp.pad(k_seg_full, ((0, s8 - s_len), (0, b_pad - batch)), constant_values=-1)
        k_valid_full = jnp.concatenate(
            [(jnp.swapaxes(cache_mask, 0, 1) > 0.5).astype(jnp.int32), jnp.ones((t_len, batch), jnp.int32)],
            axis=0,
        )
        k_valid_em = jnp.pad(k_valid_full, ((0, s8 - s_len), (0, b_pad - batch)))

        slopes = alibi_slopes(heads) if self.use_alibi else None
        slopes_t = None if slopes is None else tuple(float(s) for s in jax.device_get(slopes))
        out_em = _lane_em_op(
            pad_em(q_em, t8), pad_em(k_rot, s8), pad_em(v_all, s8),
            q_seg_em, k_seg_em, k_valid_em, window, slopes_t, 128,
        )  # [H, D, T8, Bp] fp32

        # Out-projection in env-minor layout; one transpose back to [T, B, E].
        out_flat = out_em[:, :, :t_len, :batch].reshape(embed, t_len * batch)
        op = mha.out_proj
        if op.compute_dtype is not None:
            odt = jnp.dtype(op.compute_dtype)
            y = jnp.dot(op.weight.astype(odt), out_flat.astype(odt), preferred_element_type=jnp.float32)
            if op.bias is not None:
                y = y + op.bias[:, None]
            y = y.astype(odt)
        else:
            y = jnp.dot(op.weight, out_flat.astype(jnp.float32), preferred_element_type=jnp.float32)
            if op.bias is not None:
                y = y + op.bias[:, None]
        outputs = y.T.reshape(t_len, batch, embed)

        # Final ring memory from the last W+1 combined tokens.
        slots = self._ring_slots
        k_tail = jnp.transpose(k_raw[:, :, -slots:], (3, 0, 2, 1))  # [B, H, P, D]
        v_tail = jnp.transpose(v_all[:, :, -slots:], (3, 0, 2, 1))
        k_valid_nt = jnp.swapaxes(k_valid_full, 0, 1)  # [B, S]
        k_seg_nt = jnp.swapaxes(k_seg_full, 0, 1)
        final_seg = seg[-1] + done2[-1].astype(jnp.int32)
        final_valid = (k_valid_nt > 0) & (k_seg_nt == final_seg[:, None])
        new_memory = {
            "k_cache": jax.lax.stop_gradient(k_tail.astype(memory["k_cache"].dtype)),
            "v_cache": jax.lax.stop_gradient(v_tail.astype(memory["v_cache"].dtype)),
            "cache_mask": jax.lax.stop_gradient(
                final_valid[:, -slots:].astype(memory["cache_mask"].dtype)
            ),
            "cursor": jnp.broadcast_to(jnp.zeros((), jnp.int32), memory["cursor"].shape),
        }
        return outputs, new_memory, {}

    def _sequence_batched(self, x, memory, done, *, collect_ctx: bool = False):
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
        q, k_rot, v_all, k_raw, cache_mask, q_pos, k_pos = self._sequence_qkv(x, memory)
        done2, seg = self._segments(done, t_len, batch)

        in_window = (k_pos[None, :] <= q_pos[:, None]) & (k_pos[None, :] >= q_pos[:, None] - window)  # [T, W+T]

        # Per-instance key validity/segments in combined index space.
        k_seg = jnp.concatenate([jnp.zeros((window, batch), jnp.int32), seg], axis=0)  # [W+T, N]
        k_valid = jnp.concatenate([jnp.swapaxes(cache_mask, 0, 1) > 0.5, jnp.ones((t_len, batch), bool)], axis=0)

        same_seg = seg[:, None, :] == k_seg[None, :, :]  # [T, W+T, N]
        mask = in_window[:, :, None] & same_seg & k_valid[None, :, :]  # [T, W+T, N]
        mask = jnp.moveaxis(mask, -1, 0)[:, None]  # [N, 1, T, W+T]

        bias = None
        if self.use_alibi:
            slopes = alibi_slopes(self.mha.num_heads)  # [H]
            distance = (q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)  # [T, W+T]
            bias = -slopes[:, None, None] * distance[None]  # [H, T, W+T]

        # Lane-align the key axis: TPU vector registers are 128 lanes wide, so
        # a short combined key axis (e.g. W+T = 40 on the locomotion config)
        # runs every score/softmax/PV op at S/128 lane utilization AND at
        # relayout-crippled HBM bandwidth (traced at ~60-300 GB/s).  Keys are
        # padded AFTER projection + RoPE, so only the masked score/softmax/PV
        # chain widens; projections stay at the true S.
        s_len = window + t_len
        s_pad = -(-s_len // 128) * 128
        k_sdpa, v_sdpa = k_rot, v_all
        if s_pad != s_len:
            extra = s_pad - s_len
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, extra)))
            if bias is not None:
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, extra)))
            pad = [(0, 0), (0, 0), (0, extra), (0, 0)]
            k_sdpa, v_sdpa = jnp.pad(k_rot, pad), jnp.pad(v_all, pad)

        out = scaled_dot_product_attention(q, k_sdpa, v_sdpa, mask=mask, bias=bias)  # [N, H, T, D]
        outputs = jnp.swapaxes(self.mha.merge_output(out), 0, 1)  # [T, N, C]

        k_valid_nt = jnp.swapaxes(k_valid, 0, 1).astype(jnp.int32)  # [N, W+T]
        k_seg_nt = jnp.swapaxes(k_seg, 0, 1)  # [N, W+T]
        new_memory = self._final_memory(k_raw, v_all, k_valid_nt, k_seg_nt, seg, done2, memory)
        aux = {}
        if collect_ctx:
            aux["next_ctx"] = (k_rot, v_all, k_valid_nt, k_seg_nt, jnp.swapaxes(seg, 0, 1))
        return outputs, new_memory, aux

    # -- counterfactual-append evaluation (nn/base.py contract) ----------------

    @property
    def supports_next_token_eval(self) -> bool:
        return True

    def sequential_with_ctx(self, x, memory: Memory, done):
        out, new_memory, aux = self(x, memory, sequential=True, done=done, collect_next_ctx=True)
        return out, new_memory, aux.pop("next_ctx")

    def eval_next_core(self, q, k_self_rot, v_self, ctx):
        """Cross+self attention for counterfactual-append queries.

        Query t attends the value-pass keys at combined positions
        ``[t+1, W+t]`` — exactly the W tokens its ring would still hold after
        writing y[t] over the oldest slot — plus its own k/v (the self key the
        single-step path writes before attending).  Same segment/validity
        masking as the sequence paths; fp32 softmax with the self logit folded
        into the normalizer.  ``q``/``k_self_rot`` are RoPE'd at positions
        ``W + t + 1`` — one AFTER x[t], so x[t] sits at relative distance 1
        and the self key at 0, matching the stepwise ring's age-derived
        rotations.  Returns ``[N, H, T, D]`` fp32 (merge-ready).
        """
        from cusrl_tpu.nn.kernels.lane_attention import lane_next_token_attention

        k_rot, v_all, k_valid, k_seg, q_seg = ctx
        slopes = alibi_slopes(self.mha.num_heads) if self.use_alibi else None
        # Kernel routing mirrors the sequence "auto" rule: the lane-layout
        # Pallas kernel on TPU outside meshes at short T; the XLA oracle
        # (dense masked softmax with the self logit folded in) otherwise —
        # forward-only either way (bootstrap values are stop-gradient).
        in_mesh = False
        try:
            amb = jax.sharding.get_abstract_mesh()
            in_mesh = amb is not None and not getattr(amb, "empty", True)
        except Exception:  # noqa: BLE001 - conservative under exotic contexts
            in_mesh = False
        use_pallas = q.shape[2] <= 64 and jax.default_backend() == "tpu" and not in_mesh
        return lane_next_token_attention(
            q, k_self_rot, v_self, k_rot, v_all, q_seg, k_seg, k_valid,
            window=self.window, slopes=slopes, use_pallas=use_pallas,
        )

    def eval_next_token(self, y, ctx):
        """y [T, N, C] -> [T, N, C]: attention output for y[t] as if processed
        right after x[t] (ring advanced by y[t]'s own write), without
        advancing the ring."""
        t_len = y.shape[0]
        q_pos = self.window + 1 + jnp.arange(t_len)
        y_nt = jnp.swapaxes(y, 0, 1)  # [N, T, C]
        q, k_self, v_self = self.mha.project_qkv_raw(y_nt, q_positions=q_pos)
        k_self_rot = self.mha.rope_k(k_self, q_pos)
        out = self.eval_next_core(q, k_self_rot, v_self, ctx)
        return jnp.swapaxes(self.mha.merge_output(out), 0, 1)  # [T, N, C]


def fused_pair_sequence(layer_a, layer_c, xa, xc, mem_a, mem_c, done):
    """Actor+critic encoder layers evaluated as ONE pair-kernel pass
    (nn/kernels/fused_block.py pair variants): two pre chains in one program,
    ONE lane-attention call over the env-concatenated halves (attention has no
    weights and both layers share static config), two post chains in one
    program.  Halves kernel launches per minibatch step vs two separate fused
    passes.

    Requires both memories to share the global ring cursor — true by
    construction in this framework (both backbones advance through the same
    rollout).  Returns (latent_a, latent_c, new_mem_a, new_mem_c).
    """
    from cusrl_tpu.nn.kernels.fused_block import fused_block_pair_post, fused_block_pair_pre

    t_len, batch = xa.shape[:2]
    rows = t_len * batch
    use_pallas, interpret = layer_a._fused_flags()
    ha, hc, qkva, qkvc = fused_block_pair_pre(
        xa.reshape(rows, xa.shape[-1]), xc.reshape(rows, xc.shape[-1]),
        layer_a._pre_params(), layer_c._pre_params(),
        use_pallas=use_pallas, interpret=interpret,
    )
    embed = layer_a.attention.input_dim
    qkv_dim = qkva.shape[-1]
    import os

    if os.environ.get("CUSRL_TPU_PAIR_CONCAT", "0") == "1":
        # Env-concatenated single lane pass: one attention launch for both
        # nets, but the concat/split copies of qkv + rings traced at ~1.5
        # ms/iter at bench shapes — default OFF (two lane calls, no copies).
        qkv_cat = jnp.concatenate(
            [qkva.reshape(t_len, batch, qkv_dim), qkvc.reshape(t_len, batch, qkv_dim)], axis=1
        ).reshape(t_len * 2 * batch, qkv_dim)
        mem_cat = {
            "k_cache": jnp.concatenate([mem_a["k_cache"], mem_c["k_cache"]], axis=0),
            "v_cache": jnp.concatenate([mem_a["v_cache"], mem_c["v_cache"]], axis=0),
            "cache_mask": jnp.concatenate([mem_a["cache_mask"], mem_c["cache_mask"]], axis=0),
            "cursor": mem_a["cursor"],
        }
        done_cat = jnp.concatenate([done, done], axis=1)
        attn_cat, new_mem_cat = layer_a.attention.sequence_core(qkv_cat, mem_cat, done_cat, t_len, 2 * batch)
        attn3 = attn_cat.reshape(t_len, 2 * batch, embed)
        attna = attn3[:, :batch].reshape(rows, embed)
        attnc = attn3[:, batch:].reshape(rows, embed)

        def split_mem(half):
            sl = slice(0, batch) if half == 0 else slice(batch, 2 * batch)
            return {
                "k_cache": new_mem_cat["k_cache"][sl],
                "v_cache": new_mem_cat["v_cache"][sl],
                "cache_mask": new_mem_cat["cache_mask"][sl],
                "cursor": new_mem_cat["cursor"],
            }

        new_mem_a, new_mem_c = split_mem(0), split_mem(1)
    else:
        attna, new_mem_a = layer_a.attention.sequence_core(qkva, mem_a, done, t_len, batch)
        attnc, new_mem_c = layer_c.attention.sequence_core(qkvc, mem_c, done, t_len, batch)

    outa, outc = fused_block_pair_post(
        attna, attnc, ha, hc, layer_a._post_params(), layer_c._post_params(),
        layer_a.feed_forward.activation, use_pallas=use_pallas, interpret=interpret,
    )

    return (
        outa.reshape(t_len, batch, embed),
        outc.reshape(t_len, batch, embed),
        new_mem_a,
        new_mem_c,
    )


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

    def init_memory(self, batch_size, dtype=None) -> Memory:
        return self.attention.init_memory(batch_size, dtype)

    def _chain(self, h, attend):
        """The residual/gate/norm skeleton shared by every route (stepwise,
        sequence, ctx-collecting, counterfactual-append): ``attend`` maps the
        (possibly norm1'd) attention input to ``(attn_out, extra)``.  ONE
        source of truth for the norm-mode orderings — the deferred-sequential
        exact-equality contract depends on all routes sharing it."""
        if self.norm_mode == "pre":
            attn_out, extra = attend(self.norm1(h))
            out = self.gate1(h, attn_out)
            out = self.gate2(out, self.feed_forward(self.norm2(out)))
        elif self.norm_mode == "post":
            attn_out, extra = attend(h)
            out = self.norm1(self.gate1(h, attn_out))
            out = self.norm2(self.gate2(out, self.feed_forward(out)))
        else:
            attn_out, extra = attend(h)
            out = self.gate1(h, attn_out)
            out = self.gate2(out, self.feed_forward(out))
        return out, extra

    def _block(self, h, memory, *, sequential, done):
        return self._chain(
            h, lambda a: self.attention(a, memory, sequential=sequential, done=done)[:2]
        )

    def _fused_block_mode(self) -> str:
        """CUSRL_TPU_FUSED_TRANSFORMER: 1 (auto, default) engages the fused-block
        kernels on TPU outside meshes; 0 disables; "force" engages everywhere
        (interpret-mode kernels off-TPU — the CPU test hook)."""
        import os

        return os.environ.get("CUSRL_TPU_FUSED_TRANSFORMER", "1").lower()

    def _fused_eligible(self, x, sequential: bool) -> bool:
        """The fused transformer-block kernels cover the preset configuration:
        pre-norm, residual gates, fused-projection-friendly Linears (bf16 with
        bias), no QK-norm, supported FFN activation, large batches.  Covers
        BOTH the sequence path (minibatch BPTT) and the single-step path (the
        rollout scan — primal-only kernels, attention middle = ring DUS +
        masked SDPA).  Anything else keeps the modular path."""
        mode = self._fused_block_mode()
        if mode == "0" or x.ndim != (3 if sequential else 2):
            return False
        if not sequential and mode != "force":
            # Step route default-OFF: measured 61.5 vs 57.9 ms/iter on the
            # transformer bench — 96 extra kernel launches per iteration (2
            # kernels x 2 nets x 24 steps) cost more than the XLA step soup
            # they replace, which XLA fuses into neighbors for free.  Revival:
            # CUSRL_TPU_FUSED_TRANSFORMER_STEP=1, worth retrying at larger
            # embed dims or deeper stacks (docs/ROADMAP.md option ledger).
            import os

            if os.environ.get("CUSRL_TPU_FUSED_TRANSFORMER_STEP", "0") != "1":
                return False
        if self.norm_mode != "pre" or self.input_proj is None:
            return False
        from cusrl_tpu.nn.layer.gate import ResidualGate

        if not (isinstance(self.gate1, ResidualGate) and isinstance(self.gate2, ResidualGate)):
            return False
        attn = self.attention
        if attn.mha.q_norm is not None or attn.sequence_mode not in ("auto", "lane", "banded"):
            return False
        ff = self.feed_forward
        if ff.glu:
            return False
        from cusrl_tpu.nn.kernels.fused_block import supports_fused_block
        from cusrl_tpu.nn.kernels.fused_mlp import kernel_mesh_status

        if not supports_fused_block(ff.activation):
            return False
        mha = attn.mha
        linears = (self.input_proj, mha.q_proj, mha.k_proj, mha.v_proj, mha.out_proj, ff.up, ff.down)
        if not all(l.compute_dtype == "bfloat16" and l.bias is not None for l in linears):
            return False
        rows = x.shape[0] * (x.shape[1] if sequential else 1)
        if mode == "force":
            return True
        if rows < 256 or jax.default_backend() != "tpu":
            return False
        # Under any ambient mesh fall back to the modular path (which itself
        # falls back to the XLA chain) — Pallas custom calls do not partition
        # over NamedShardings; pure-DP shard_map wrapping of the whole block is
        # the pre/post ops' own concern when engaged explicitly.
        return kernel_mesh_status(rows) == (True, None)

    def _fused_flags(self):
        force = self._fused_block_mode() == "force"
        interpret = force and jax.default_backend() != "tpu"
        return (True if force else None), interpret

    def _pre_params(self):
        mha = self.attention.mha
        w_qkv = jnp.concatenate([mha.q_proj.weight.T, mha.k_proj.weight.T, mha.v_proj.weight.T], axis=1)
        b_qkv = jnp.concatenate([mha.q_proj.bias, mha.k_proj.bias, mha.v_proj.bias])[None, :]
        return (
            self.input_proj.weight.T, self.input_proj.bias[None, :],
            self.norm1.scale[None, :], self.norm1.bias[None, :],
            w_qkv, b_qkv,
        )

    def _post_params(self):
        mha = self.attention.mha
        ff = self.feed_forward
        return (
            mha.out_proj.weight.T, mha.out_proj.bias[None, :],
            self.norm2.scale[None, :], self.norm2.bias[None, :],
            ff.up.weight.T, ff.up.bias[None, :],
            ff.down.weight.T, ff.down.bias[None, :],
        )

    def _fused_sequence(self, x, memory, done):
        """Whole-layer sequence path via the fused-block kernels: every matmul
        and LayerNorm of the block runs inside two Pallas programs bracketing
        the attention kernel (nn/kernels/fused_block.py)."""
        from cusrl_tpu.nn.kernels.fused_block import fused_block_pre, fused_block_post

        t_len, batch = x.shape[:2]
        rows = t_len * batch
        attn = self.attention
        use_pallas, interpret = self._fused_flags()

        x_flat = x.reshape(rows, x.shape[-1])
        h, qkv = fused_block_pre(x_flat, *self._pre_params(), use_pallas=use_pallas, interpret=interpret)
        attn_flat, new_memory = attn.sequence_core(qkv, memory, done, t_len, batch)
        out = fused_block_post(
            attn_flat, h, *self._post_params(), self.feed_forward.activation,
            use_pallas=use_pallas, interpret=interpret,
        )
        return out.reshape(t_len, batch, -1), new_memory, {}

    def _fused_step(self, x, memory):
        """Single-step (rollout) path via the fused-block kernels' PRIMAL
        variants: pre kernel -> ring write + masked SDPA -> post kernel.
        Collapses the step's ~15-op XLA matmul/norm soup into two kernel calls
        around the tiny ring attention (the rollout scan traced at ~14.5
        ms/iter at bench shapes)."""
        from cusrl_tpu.nn.kernels.fused_block import fused_block_pre, fused_block_post

        attn = self.attention
        mha = attn.mha
        heads = mha.num_heads
        embed = attn.input_dim
        head_dim = embed // heads
        batch = x.shape[0]
        use_pallas, interpret = self._fused_flags()

        h, qkv = fused_block_pre(x, *self._pre_params(), use_pallas=use_pallas, interpret=interpret)

        def to_heads(cols):
            return qkv[:, cols : cols + embed].reshape(batch, heads, 1, head_dim)

        q, k_new, v_new = to_heads(0), to_heads(embed), to_heads(2 * embed)
        if mha.rope is not None:
            q = mha.rope(q, jnp.full((1,), attn.window, jnp.int32))
        attn_merged, new_memory = attn.step_core(q, k_new, v_new, memory)
        out = fused_block_post(
            attn_merged, h, *self._post_params(), self.feed_forward.activation,
            use_pallas=use_pallas, interpret=interpret,
        )
        return out, new_memory, {}

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, done=None, **kwargs):
        if self._fused_eligible(x, sequential):
            if sequential:
                if memory is None:
                    memory = self.init_memory(x.shape[1])
                if done is None:
                    done = jnp.zeros((*x.shape[:2], 1), bool)
                return self._fused_sequence(x, memory, done)
            if memory is None:
                memory = self.init_memory(x.shape[0])
            return self._fused_step(x, memory)
        h = self.input_proj(x) if self.input_proj is not None else x
        h, new_memory = self._block(h, memory, sequential=sequential, done=done)
        return h, new_memory, {}

    # -- counterfactual-append evaluation (nn/base.py contract) ----------------

    @property
    def supports_next_token_eval(self) -> bool:
        return True

    def sequential_with_ctx(self, x, memory: Memory, done):
        """Sequence pass that also captures the attention key context for
        :meth:`eval_next_token` — same route selection as ``__call__``."""
        if memory is None:
            memory = self.init_memory(x.shape[1])
        if done is None:
            done = jnp.zeros((*x.shape[:2], 1), bool)
        if self._fused_eligible(x, True):
            from cusrl_tpu.nn.kernels.fused_block import fused_block_post, fused_block_pre

            t_len, batch = x.shape[:2]
            rows = t_len * batch
            use_pallas, interpret = self._fused_flags()
            x_flat = x.reshape(rows, x.shape[-1])
            h, qkv = fused_block_pre(x_flat, *self._pre_params(), use_pallas=use_pallas, interpret=interpret)
            attn_flat, new_memory, ctx = self.attention.sequence_core(
                qkv, memory, done, t_len, batch, collect_ctx=True
            )
            out = fused_block_post(
                attn_flat, h, *self._post_params(), self.feed_forward.activation,
                use_pallas=use_pallas, interpret=interpret,
            )
            return out.reshape(t_len, batch, -1), new_memory, ctx
        h = self.input_proj(x) if self.input_proj is not None else x

        def attend(a):
            out, new_memory, aux = self.attention(
                a, memory, sequential=True, done=done, collect_next_ctx=True
            )
            return out, (new_memory, aux.pop("next_ctx"))

        out, (new_memory, ctx) = self._chain(h, attend)
        return out, new_memory, ctx

    def eval_next_token(self, y, ctx):
        attn = self.attention
        mha = attn.mha
        t_len, batch = y.shape[:2]
        q_pos = attn.window + 1 + jnp.arange(t_len)
        if self._fused_eligible(y, True):
            from cusrl_tpu.nn.kernels.fused_block import fused_block_post, fused_block_pre

            rows = t_len * batch
            embed = attn.input_dim
            heads = mha.num_heads
            head_dim = embed // heads
            use_pallas, interpret = self._fused_flags()
            h, qkv = fused_block_pre(
                y.reshape(rows, y.shape[-1]), *self._pre_params(),
                use_pallas=use_pallas, interpret=interpret,
            )

            def to_heads(cols):
                part = qkv[:, cols : cols + embed].reshape(t_len, batch, heads, head_dim)
                return jnp.transpose(part, (1, 2, 0, 3))  # [N, H, T, D]

            q, k_self, v_self = to_heads(0), to_heads(embed), to_heads(2 * embed)
            if mha.rope is not None:
                q = mha.rope(q, q_pos)
            k_self_rot = mha.rope_k(k_self, q_pos)
            out_heads = attn.eval_next_core(q, k_self_rot, v_self, ctx)
            merged = mha._merge(out_heads)  # [N, T, E] fp32
            merged_flat = jnp.swapaxes(merged, 0, 1).reshape(rows, embed)
            out = fused_block_post(
                merged_flat, h, *self._post_params(), self.feed_forward.activation,
                use_pallas=use_pallas, interpret=interpret,
            )
            return out.reshape(t_len, batch, -1)
        h = self.input_proj(y) if self.input_proj is not None else y

        def attend(a):
            q, k_self, v_self = mha.project_qkv_raw(jnp.swapaxes(a, 0, 1), q_positions=q_pos)
            k_self_rot = mha.rope_k(k_self, q_pos)
            out_heads = attn.eval_next_core(q, k_self_rot, v_self, ctx)
            return jnp.swapaxes(mha.merge_output(out_heads), 0, 1), None  # [T, N, E]

        out, _ = self._chain(h, attend)
        return out


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
