"""Fused transformer-block kernels (nn/kernels/fused_block.py): the Pallas
pre/post programs (interpret mode on CPU) must match the XLA references, and
the whole-layer fused route must match the modular CausalTransformerEncoderLayer
path in outputs, memory, and gradients.

Counterpart role: the reference's transformer update path is flex_attention +
separate projections under torch.compile (cusrl/nn/module/causal_attn.py:49-259);
here the block's matmuls/norms are two explicit kernels around the lane kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.kernels.fused_block import (
    _post_reference,
    _pre_reference,
    fused_block_post,
    fused_block_pre,
)

EMBED, FF, IN_DIM, ROWS = 32, 64, 12, 100


def _pre_params(seed=0):
    keys = jax.random.split(jax.random.key(seed), 6)
    w_in = jax.random.normal(keys[0], (IN_DIM, EMBED), jnp.float32) / np.sqrt(IN_DIM)
    b_in = jax.random.normal(keys[1], (1, EMBED), jnp.float32) * 0.1
    g1 = 1.0 + 0.1 * jax.random.normal(keys[2], (1, EMBED), jnp.float32)
    bb1 = 0.1 * jax.random.normal(keys[3], (1, EMBED), jnp.float32)
    w_qkv = jax.random.normal(keys[4], (EMBED, 3 * EMBED), jnp.float32) / np.sqrt(EMBED)
    b_qkv = jax.random.normal(keys[5], (1, 3 * EMBED), jnp.float32) * 0.1
    return w_in, b_in, g1, bb1, w_qkv, b_qkv


def _post_params(seed=1):
    keys = jax.random.split(jax.random.key(seed), 8)
    w_o = jax.random.normal(keys[0], (EMBED, EMBED), jnp.float32) / np.sqrt(EMBED)
    b_o = jax.random.normal(keys[1], (1, EMBED), jnp.float32) * 0.1
    g2 = 1.0 + 0.1 * jax.random.normal(keys[2], (1, EMBED), jnp.float32)
    bb2 = 0.1 * jax.random.normal(keys[3], (1, EMBED), jnp.float32)
    w_up = jax.random.normal(keys[4], (EMBED, FF), jnp.float32) / np.sqrt(EMBED)
    b_up = jax.random.normal(keys[5], (1, FF), jnp.float32) * 0.1
    w_down = jax.random.normal(keys[6], (FF, EMBED), jnp.float32) / np.sqrt(FF)
    b_down = jax.random.normal(keys[7], (1, EMBED), jnp.float32) * 0.1
    return w_o, b_o, g2, bb2, w_up, b_up, w_down, b_down


def test_pre_kernel_matches_reference():
    params = _pre_params()
    x = jax.random.normal(jax.random.key(2), (ROWS, IN_DIM), jnp.float32)
    h_ref, qkv_ref = _pre_reference(x, *params)
    h, qkv = fused_block_pre(x, *params, use_pallas=True, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(h, np.float32), np.asarray(h_ref, np.float32), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(qkv, np.float32), np.asarray(qkv_ref, np.float32), atol=3e-2, rtol=3e-2)


def test_pre_kernel_grads_match_reference():
    params = _pre_params(3)
    x = jax.random.normal(jax.random.key(4), (ROWS, IN_DIM), jnp.float32)
    th = jax.random.normal(jax.random.key(5), (ROWS, EMBED), jnp.float32)
    tq = jax.random.normal(jax.random.key(6), (ROWS, 3 * EMBED), jnp.float32)

    def loss(fn):
        def inner(p):
            h, qkv = fn(x, *p)
            return jnp.mean(jnp.square(h.astype(jnp.float32) - th)) + jnp.mean(
                jnp.square(qkv.astype(jnp.float32) - tq)
            )

        return inner

    g_ref = jax.grad(loss(lambda *a: _pre_reference(*a)))(params)
    g_ker = jax.grad(loss(lambda *a: fused_block_pre(*a, use_pallas=True, block_rows=32, interpret=True)))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3, rtol=5e-2)


@pytest.mark.parametrize("activation", ["gelu", "elu", "relu", "identity"])
def test_post_kernel_matches_reference(activation):
    params = _post_params()
    attn = jax.random.normal(jax.random.key(7), (ROWS, EMBED), jnp.float32)
    h = jax.random.normal(jax.random.key(8), (ROWS, EMBED), jnp.float32).astype(jnp.bfloat16)
    out_ref = _post_reference(attn, h, *params, activation)
    out = fused_block_post(attn, h, *params, activation, use_pallas=True, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(out_ref, np.float32), atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("activation", ["gelu", "elu"])
def test_post_kernel_grads_match_reference(activation):
    params = _post_params(9)
    attn = jax.random.normal(jax.random.key(10), (ROWS, EMBED), jnp.float32)
    h = jax.random.normal(jax.random.key(11), (ROWS, EMBED), jnp.float32).astype(jnp.bfloat16)
    tgt = jax.random.normal(jax.random.key(12), (ROWS, EMBED), jnp.float32)

    def loss(fn):
        def inner(p, attn_, h_):
            out = fn(attn_, h_, *p)
            return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

        return inner

    g_ref, ga_ref, gh_ref = jax.grad(
        loss(lambda *a: _post_reference(*a, activation)), argnums=(0, 1, 2)
    )(params, attn, h)
    g_ker, ga_ker, gh_ker = jax.grad(
        loss(lambda *a: fused_block_post(*a, activation, use_pallas=True, block_rows=32, interpret=True)),
        argnums=(0, 1, 2),
    )(params, attn, h)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(ga_ker), np.asarray(ga_ref), atol=5e-3, rtol=5e-2)
    np.testing.assert_allclose(
        np.asarray(gh_ker, np.float32), np.asarray(gh_ref, np.float32), atol=5e-3, rtol=5e-2
    )


def test_post_primal_matches_grad_path_forward():
    """Primal-only call (no saved activations) must equal the vjp forward."""
    params = _post_params(13)
    attn = jax.random.normal(jax.random.key(14), (ROWS, EMBED), jnp.float32)
    h = jax.random.normal(jax.random.key(15), (ROWS, EMBED), jnp.float32).astype(jnp.bfloat16)
    primal = fused_block_post(attn, h, *params, "gelu", use_pallas=True, block_rows=32, interpret=True)
    grad_path, _ = jax.vjp(
        lambda a: fused_block_post(a, h, *params, "gelu", use_pallas=True, block_rows=32, interpret=True),
        attn,
    )
    np.testing.assert_array_equal(np.asarray(primal, np.float32), np.asarray(grad_path, np.float32))


# ---------------------------------------------------------------------------
# Whole-layer route equality
# ---------------------------------------------------------------------------


def _make_layer(seed=0, in_dim=12, embed=32, heads=2, window=4, ff=64):
    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory

    factory = CausalTransformerEncoderLayerFactory(
        embed_dim=embed, num_heads=heads, window=window, ff_dim=ff, compute_dtype="bfloat16"
    )
    return factory(in_dim, None, jax.random.key(seed))


@pytest.mark.parametrize("t_len,batch", [(12, 9), (8, 16)])
def test_layer_fused_route_matches_modular_path(monkeypatch, t_len, batch):
    layer = _make_layer()
    keys = jax.random.split(jax.random.key(20), 3)
    x = jax.random.normal(keys[0], (t_len, batch, 12), jnp.float32)
    done = jax.random.uniform(keys[1], (t_len, batch, 1)) < 0.15
    memory = layer.init_memory(batch)
    # Partially valid cache entries exercise the cache-concat path.
    memory["k_cache"] = jax.random.normal(keys[2], memory["k_cache"].shape).astype(memory["k_cache"].dtype)
    memory["v_cache"] = jnp.ones_like(memory["v_cache"]) * 0.3
    memory["cache_mask"] = memory["cache_mask"].at[:, ::2].set(1.0)

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "0")
    out_ref, mem_ref, _ = layer(x, memory, sequential=True, done=done)
    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    assert layer._fused_eligible(x, True)
    out_fused, mem_fused, _ = layer(x, memory, sequential=True, done=done)

    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32), np.asarray(out_ref, np.float32), atol=5e-2, rtol=5e-2
    )
    for key in ("k_cache", "v_cache", "cache_mask", "cursor"):
        np.testing.assert_allclose(
            np.asarray(mem_fused[key], np.float32), np.asarray(mem_ref[key], np.float32), atol=3e-2, rtol=3e-2
        )


def test_layer_fused_route_grads_match_modular_path(monkeypatch):
    layer = _make_layer(seed=5)
    keys = jax.random.split(jax.random.key(21), 3)
    t_len, batch = 8, 12
    x = jax.random.normal(keys[0], (t_len, batch, 12), jnp.float32)
    done = jax.random.uniform(keys[1], (t_len, batch, 1)) < 0.15
    tgt = jax.random.normal(keys[2], (t_len, batch, 32), jnp.float32)

    def loss(layer_):
        out, _, _ = layer_(x, layer_.init_memory(batch), sequential=True, done=done)
        return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "0")
    g_ref = jax.grad(loss)(layer)
    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    g_fused = jax.grad(loss)(layer)

    ref_leaves = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    fused_leaves = jax.tree_util.tree_flatten_with_path(g_fused)[0]
    assert len(ref_leaves) == len(fused_leaves)
    for (path_r, leaf_r), (path_f, leaf_f) in zip(ref_leaves, fused_leaves):
        assert jax.tree_util.keystr(path_r) == jax.tree_util.keystr(path_f)
        np.testing.assert_allclose(
            np.asarray(leaf_f, np.float32),
            np.asarray(leaf_r, np.float32),
            atol=2e-2,
            rtol=8e-2,
            err_msg=jax.tree_util.keystr(path_r),
        )


def test_layer_fused_ineligible_configs_fall_back(monkeypatch):
    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    x = jnp.zeros((8, 12, 12), jnp.float32)
    # post-norm mode is not covered by the fused kernels
    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory

    layer = CausalTransformerEncoderLayerFactory(
        embed_dim=32, num_heads=2, window=4, ff_dim=64, norm_mode="post", compute_dtype="bfloat16"
    )(12, None, jax.random.key(0))
    assert not layer._fused_eligible(x, True)
    # GRU gates keep the modular path
    layer = CausalTransformerEncoderLayerFactory(
        embed_dim=32, num_heads=2, window=4, ff_dim=64, gate="gru", compute_dtype="bfloat16"
    )(12, None, jax.random.key(1))
    assert not layer._fused_eligible(x, True)
    # shape/flag mismatches never fuse
    layer = _make_layer()
    assert not layer._fused_eligible(x[0], True)  # 2-D input in sequence mode
    assert not layer._fused_eligible(x, False)  # 3-D input in step mode


def test_layer_fused_step_matches_modular_step(monkeypatch):
    """The rollout (single-step) fused route: pre kernel -> ring DUS + SDPA ->
    post kernel must reproduce the modular step across a multi-step episode,
    including the ring memory evolution."""
    layer = _make_layer(seed=7)
    n = 9

    def run(n_steps):
        memory = layer.init_memory(n)
        outs = []
        for s in range(n_steps):
            x_s = jax.random.normal(jax.random.key(300 + s), (n, 12), jnp.float32)
            out, memory, _ = layer(x_s, memory, sequential=False)
            outs.append(out)
        return outs, memory

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "0")
    outs_ref, mem_ref = run(7)
    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    assert layer._fused_eligible(jnp.zeros((n, 12)), False)
    outs_fused, mem_fused = run(7)

    for a, b in zip(outs_ref, outs_fused):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32), atol=5e-2, rtol=5e-2
        )
    for key in ("k_cache", "v_cache", "cache_mask", "cursor"):
        np.testing.assert_allclose(
            np.asarray(mem_fused[key], np.float32), np.asarray(mem_ref[key], np.float32),
            atol=3e-2, rtol=3e-2,
        )


def test_layer_fused_step_consistent_with_fused_sequence(monkeypatch):
    """Stepwise fused rollout == fused sequence mode on the same inputs (the
    recurrence-consistency invariant, CLAUDE.md)."""
    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    layer = _make_layer(seed=11)
    t_len, n = 10, 6
    x = jax.random.normal(jax.random.key(400), (t_len, n, 12), jnp.float32)
    memory = layer.init_memory(n)

    outs = []
    mem = memory
    for s in range(t_len):
        out, mem, _ = layer(x[s], mem, sequential=False)
        outs.append(out)
    out_step = jnp.stack(outs)

    out_seq, _, _ = layer(x, memory, sequential=True, done=jnp.zeros((t_len, n, 1), bool))
    np.testing.assert_allclose(
        np.asarray(out_seq, np.float32), np.asarray(out_step, np.float32), atol=6e-2, rtol=6e-2
    )
