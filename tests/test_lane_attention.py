"""Cross-env lane attention: the Pallas kernel (interpret mode on CPU) must
reproduce the masked-SDPA reference and the definitional scan cell."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.kernels.lane_attention import _lane_reference, lane_window_attention


# Interpret mode simulates every unrolled band op per grid instance, so the
# CPU tests use SMALL bands (T=8, W=4); full bench shapes (T=24, W=16, D=32)
# are validated on real TPU by benchmarks/tpu_lane_attention_check.py.
def make_raw(t_len=8, window=4, batch=5, heads=2, head_dim=8, seed=0, segments=True):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    s_len = window + t_len
    q = jax.random.normal(keys[0], (batch, heads, t_len, head_dim), jnp.float32)
    k = jax.random.normal(keys[1], (batch, heads, s_len, head_dim), jnp.float32)
    v = jax.random.normal(keys[2], (batch, heads, s_len, head_dim), jnp.float32)
    if segments:
        done = jax.random.bernoulli(keys[3], 0.1, (batch, t_len))
        q_seg = jnp.cumsum(jnp.pad(done.astype(jnp.int32), ((0, 0), (1, 0)))[:, :-1], axis=1)
    else:
        q_seg = jnp.zeros((batch, t_len), jnp.int32)
    k_seg = jnp.concatenate([jnp.zeros((batch, window), jnp.int32), q_seg], axis=1)
    k_valid = jnp.concatenate(
        [jax.random.bernoulli(keys[4], 0.5, (batch, window)).astype(jnp.int32),
         jnp.ones((batch, t_len), jnp.int32)],
        axis=1,
    )
    return q, k, v, q_seg, k_seg, k_valid


def test_lane_reference_matches_banded_reference():
    from cusrl_tpu.nn.kernels.banded_attention import _banded_reference

    q, k, v, q_seg, k_seg, k_valid = make_raw(t_len=24, window=16, heads=4, head_dim=32)
    ref_lane = _lane_reference(q, k, v, q_seg, k_seg, k_valid, 16, None)
    ref_band = _banded_reference(q, k, v, q_seg, k_seg, k_valid, 16, None, 128)
    np.testing.assert_allclose(np.asarray(ref_lane), np.asarray(ref_band), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_alibi", [False, True])
@pytest.mark.parametrize("t_len,window", [(8, 4), (7, 5)])
def test_lane_kernel_interpret_matches_reference(use_alibi, t_len, window):
    q, k, v, q_seg, k_seg, k_valid = make_raw(t_len=t_len, window=window)
    slopes = jnp.array([0.5, 0.25], jnp.float32) if use_alibi else None
    ref = _lane_reference(q, k, v, q_seg, k_seg, k_valid, window, slopes)
    # use_pallas=True on CPU runs the kernel under interpret=True.
    got = lane_window_attention(q, k, v, q_seg, k_seg, k_valid, window=window,
                                slopes=slopes, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_lane_kernel_grads_match_reference():
    window = 4
    q, k, v, q_seg, k_seg, k_valid = make_raw(window=window)

    def loss_op(q_, k_, v_):
        out = lane_window_attention(q_, k_, v_, q_seg, k_seg, k_valid, window=window, use_pallas=True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q_, k_, v_):
        return jnp.sum(jnp.sin(_lane_reference(q_, k_, v_, q_seg, k_seg, k_valid, window, None)))

    grads_op = jax.grad(loss_op, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(grads_op, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_lane_kernel_invalid_rows_zero():
    # Queries whose segment matches nothing (all keys invalid + fresh segment)
    # cannot occur for real queries (self always valid), but padded time rows
    # exercise the guarded-denominator path; outputs must stay finite.
    q, k, v, q_seg, k_seg, k_valid = make_raw(t_len=9, window=4)
    out = lane_window_attention(q, k, v, q_seg, k_seg, k_valid, window=4, use_pallas=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_lane_em_variant_matches_scan_mode(monkeypatch):
    """The default-off env-minor lane path (CUSRL_TPU_LANE_EM=1) must produce
    the same outputs/memory as the scan cell."""
    monkeypatch.setenv("CUSRL_TPU_LANE_EM", "1")
    from tests.test_attention import make_layer

    layer = make_layer(embed_dim=32, num_heads=4, window=6, compute_dtype=None)
    attn = layer.attention
    lane_attn = attn.replace(sequence_mode="lane")
    scan_attn = attn.replace(sequence_mode="scan")

    t, n = 10, 4
    x = jax.random.normal(jax.random.key(70), (t, n, attn.input_dim))
    done = jax.random.uniform(jax.random.key(71), (t, n, 1)) < 0.25
    memory = attn.init_memory(n)
    for s in range(2):
        _, memory, _ = attn(jax.random.normal(jax.random.key(80 + s), (n, attn.input_dim)), memory)

    out_l, mem_l, _ = lane_attn(x, memory, sequential=True, done=done)
    out_s, mem_s, _ = scan_attn(x, memory, sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_s), atol=1e-5)
    _, _, mask_l = attn._unrolled_cache(mem_l)
    _, _, mask_s = attn._unrolled_cache(mem_s)
    np.testing.assert_allclose(np.asarray(mask_l), np.asarray(mask_s), atol=1e-6)


def test_lane_sequence_mode_matches_scan_mode():
    """Module-level: sequence_mode='lane' must reproduce the scan cell."""
    from tests.test_attention import make_layer

    layer = make_layer(embed_dim=32, num_heads=4, window=6, compute_dtype=None)
    attn = layer.attention
    lane_attn = attn.replace(sequence_mode="lane")
    scan_attn = attn.replace(sequence_mode="scan")

    t, n = 12, 5
    x = jax.random.normal(jax.random.key(50), (t, n, attn.input_dim))
    done = jax.random.uniform(jax.random.key(51), (t, n, 1)) < 0.25
    memory = attn.init_memory(n)
    for s in range(3):
        _, memory, _ = attn(jax.random.normal(jax.random.key(60 + s), (n, attn.input_dim)), memory)

    out_l, mem_l, _ = lane_attn(x, memory, sequential=True, done=done)
    out_s, mem_s, _ = scan_attn(x, memory, sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_s), atol=1e-5)
    _, _, mask_l = attn._unrolled_cache(mem_l)
    _, _, mask_s = attn._unrolled_cache(mem_s)
    np.testing.assert_allclose(np.asarray(mask_l), np.asarray(mask_s), atol=1e-6)


@pytest.mark.parametrize("use_alibi", [False, True])
@pytest.mark.parametrize("t_len,window", [(8, 4), (7, 5)])
def test_lane_next_token_kernel_interpret_matches_reference(use_alibi, t_len, window):
    """Counterfactual-append variant: band [t+1, W+t] plus the self key."""
    from cusrl_tpu.nn.kernels.lane_attention import (
        _next_token_reference,
        lane_next_token_attention,
    )

    q, k, v, q_seg, k_seg, k_valid = make_raw(t_len=t_len, window=window)
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    k_self = jax.random.normal(keys[0], q.shape, jnp.float32)
    v_self = jax.random.normal(keys[1], q.shape, jnp.float32)
    slopes = jnp.array([0.5, 0.25], jnp.float32) if use_alibi else None
    ref = _next_token_reference(q, k_self, v_self, k, v, q_seg, k_seg, k_valid, window, slopes)
    got = lane_next_token_attention(
        q, k_self, v_self, k, v, q_seg, k_seg, k_valid,
        window=window, slopes=slopes, use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
