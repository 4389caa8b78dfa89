"""Micro-T fused attention kernel: outputs and gradients must match the XLA
reference (same mask semantics as the banded kernel / batched SDPA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.kernels.micro_attention import micro_reference, micro_window_attention


def make_problem(key, n=20, h=4, t=24, w=16, d=32, cache_valid=0.7):
    s = w + t
    keys = jax.random.split(key, 5)
    q = jax.random.normal(keys[0], (n, h, t, d), jnp.float32)
    k = jax.random.normal(keys[1], (n, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (n, h, s, d), jnp.float32)
    done = jax.random.bernoulli(keys[3], 0.08, (n, t))
    q_seg = jnp.cumsum(jnp.pad(done.astype(jnp.int32), ((0, 0), (1, 0)))[:, :-1], axis=1)
    k_seg = jnp.concatenate([jnp.zeros((n, w), jnp.int32), q_seg], axis=1)
    k_valid = jnp.concatenate(
        [jax.random.bernoulli(keys[4], cache_valid, (n, w)).astype(jnp.int32), jnp.ones((n, t), jnp.int32)],
        axis=1,
    )
    return q, k, v, q_seg, k_seg, k_valid, w


@pytest.mark.parametrize("alibi", [False, True])
def test_micro_forward_matches_reference(alibi):
    from cusrl_tpu.nn.layer.encoding import alibi_slopes

    q, k, v, q_seg, k_seg, k_valid, w = make_problem(jax.random.key(0))
    slopes = alibi_slopes(4) if alibi else None
    ref = micro_reference(q, k, v, q_seg, k_seg, k_valid, w, slopes)
    got = micro_window_attention(
        q, k, v, q_seg, k_seg, k_valid, window=w, slopes=slopes, use_pallas=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_micro_matches_banded_semantics():
    from cusrl_tpu.nn.kernels.banded_attention import _banded_reference

    q, k, v, q_seg, k_seg, k_valid, w = make_problem(jax.random.key(1), n=12)
    banded = _banded_reference(q, k, v, q_seg, k_seg, k_valid, w, None, 128)
    micro = micro_reference(q, k, v, q_seg, k_seg, k_valid, w, None)
    np.testing.assert_allclose(np.asarray(micro), np.asarray(banded), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("alibi", [False, True])
def test_micro_gradients_match_reference(alibi):
    from cusrl_tpu.nn.layer.encoding import alibi_slopes

    q, k, v, q_seg, k_seg, k_valid, w = make_problem(jax.random.key(2), n=12)
    slopes = alibi_slopes(4) if alibi else None

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(jnp.sin(fn(q_, k_, v_)))

    ref_fn = loss(lambda *a: micro_reference(*a, q_seg, k_seg, k_valid, w, slopes))
    ker_fn = loss(
        lambda *a: micro_window_attention(
            *a, q_seg, k_seg, k_valid, window=w, slopes=slopes, use_pallas=True, interpret=True
        )
    )
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(ker_fn, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5, rtol=1e-3)


def test_micro_fully_masked_rows_zero():
    q, k, v, q_seg, k_seg, k_valid, w = make_problem(jax.random.key(3), n=8, cache_valid=0.0)
    # Row t=0 of any env whose segment differs everywhere: force by zeroing all
    # validity AND making query segments unmatched.
    k_valid = jnp.zeros_like(k_valid)
    k_seg = jnp.full_like(k_seg, 7)
    out = micro_window_attention(
        q, k, v, q_seg, k_seg, k_valid, window=w, use_pallas=True, interpret=True
    )
    assert not np.asarray(out).any()
    g = jax.grad(
        lambda q_: jnp.sum(
            micro_window_attention(q_, k, v, q_seg, k_seg, k_valid, window=w, use_pallas=True, interpret=True)
        )
    )(q)
    assert np.isfinite(np.asarray(g)).all()


def test_micro_batch_padding():
    # n not a multiple of the env block (8): padded envs must not leak.
    q, k, v, q_seg, k_seg, k_valid, w = make_problem(jax.random.key(4), n=11)
    got = micro_window_attention(
        q, k, v, q_seg, k_seg, k_valid, window=w, use_pallas=True, interpret=True
    )
    ref = micro_reference(q, k, v, q_seg, k_seg, k_valid, w, None)
    assert got.shape == ref.shape == (11, 4, 24, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_micro_sequence_mode_matches_scan_mode():
    """The module-level micro path (XLA reference on CPU) must reproduce the
    definitional scan cell, like the batched/banded modes."""
    import jax
    import numpy as np

    from tests.test_attention import make_layer

    layer = make_layer(use_rope=True, use_alibi=False, compute_dtype=None)
    attn = layer.attention
    micro_attn = attn.replace(sequence_mode="micro")
    scan_attn = attn.replace(sequence_mode="scan")

    t, n = 12, 5
    x = jax.random.normal(jax.random.key(30), (t, n, attn.input_dim))
    done = jax.random.uniform(jax.random.key(31), (t, n, 1)) < 0.25
    memory = attn.init_memory(n)
    for s in range(3):
        _, memory, _ = attn(jax.random.normal(jax.random.key(40 + s), (n, attn.input_dim)), memory)

    out_m, mem_m, _ = micro_attn(x, memory, sequential=True, done=done)
    out_s, mem_s, _ = scan_attn(x, memory, sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s), atol=1e-5)
    # Ring rotations differ (scan advances the cursor; micro emits canonical
    # cursor=0); compare the chronological unrolled masks instead.
    _, _, mask_m = attn._unrolled_cache(mem_m)
    _, _, mask_s = attn._unrolled_cache(mem_s)
    np.testing.assert_allclose(np.asarray(mask_m), np.asarray(mask_s), atol=1e-6)
