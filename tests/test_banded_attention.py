"""Banded sliding-window attention: the Pallas/banded path must reproduce the
full masked SDPA ("batched") and the definitional scan cell exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.kernels.banded_attention import (
    _banded_pallas,
    _banded_reference,
    banded_window_attention,
)
from cusrl_tpu.nn.layer.mha import MultiheadAttention
from cusrl_tpu.nn.module.causal_attn import CausalMultiheadSelfAttention


def make_module(window=8, embed=32, heads=4, mode="banded", use_alibi=False, use_rope=True):
    mha = MultiheadAttention.init(jax.random.PRNGKey(0), embed, heads, rope=use_rope)
    return CausalMultiheadSelfAttention(
        mha=mha, window=window, use_alibi=use_alibi, input_dim=embed, sequence_mode=mode
    )


def make_inputs(t_len=64, batch=5, embed=32, window=8, heads=4, seed=1):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(keys[0], (t_len, batch, embed), jnp.float32)
    done = jax.random.bernoulli(keys[1], 0.08, (t_len, batch, 1))
    slots, head_dim = window + 1, embed // heads
    memory = {
        "k_cache": jax.random.normal(keys[2], (batch, heads, slots, head_dim), jnp.float32),
        "v_cache": jax.random.normal(keys[3], (batch, heads, slots, head_dim), jnp.float32),
        "cache_mask": (jax.random.bernoulli(keys[4], 0.6, (batch, slots))).astype(jnp.float32),
        "cursor": jnp.asarray(3, jnp.int32),
    }
    return x, done, memory


@pytest.mark.parametrize("use_alibi", [False, True])
@pytest.mark.parametrize("t_len", [64, 37])
def test_banded_matches_batched_and_scan(use_alibi, t_len):
    x, done, memory = make_inputs(t_len=t_len)
    outputs, memories = {}, {}
    for mode in ("banded", "batched", "scan"):
        module = make_module(mode=mode, use_alibi=use_alibi)
        out, mem, _ = module(x, memory, sequential=True, done=done)
        outputs[mode], memories[mode] = out, mem
    np.testing.assert_allclose(outputs["banded"], outputs["batched"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(outputs["banded"], outputs["scan"], rtol=1e-4, atol=1e-5)
    for key in memories["banded"]:
        np.testing.assert_allclose(
            memories["banded"][key], memories["batched"][key], rtol=1e-4, atol=1e-5
        )


def make_raw(t_len=50, window=12, batch=3, heads=2, head_dim=16, seed=0, segments=True):
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


@pytest.mark.parametrize("use_alibi", [False, True])
@pytest.mark.parametrize("block_q", [8, 16, 128])
def test_pallas_interpret_matches_reference(use_alibi, block_q):
    window = 12
    q, k, v, q_seg, k_seg, k_valid = make_raw(window=window)
    slopes = jnp.array([0.5, 0.125], jnp.float32) if use_alibi else None
    ref = _banded_reference(q, k, v, q_seg, k_seg, k_valid, window, slopes, block_q)
    pallas = _banded_pallas(q, k, v, q_seg, k_seg, k_valid, window, slopes, block_q, interpret=True)
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_invalid_rows_are_zero():
    # A key-validity pattern where early queries in a fresh segment after the
    # cache see only themselves; fully-invalid rows cannot occur for real
    # queries (self always valid), so check padding rows stay finite instead.
    q, k, v, q_seg, k_seg, k_valid = make_raw(t_len=9, window=4)
    out = banded_window_attention(q, k, v, q_seg, k_seg, k_valid, window=4, use_pallas=False)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_custom_vjp_matches_reference_grad():
    window = 8
    q, k, v, q_seg, k_seg, k_valid = make_raw(t_len=33, window=window)

    def loss_op(q_, k_, v_):
        out = banded_window_attention(
            q_, k_, v_, q_seg, k_seg, k_valid, window=window, use_pallas=False
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(q_, k_, v_):
        out = _banded_reference(q_, k_, v_, q_seg, k_seg, k_valid, window, None, 128)
        return jnp.sum(jnp.sin(out))

    grads_op = jax.grad(loss_op, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(grads_op, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_auto_mode_selects_banded_for_long_sequences():
    # Long sequence: auto == banded output; short sequence: auto == batched.
    x, done, memory = make_inputs(t_len=256)
    auto = make_module(mode="auto")
    banded = make_module(mode="banded")
    out_a, _, _ = auto(x, memory, sequential=True, done=done)
    out_b, _, _ = banded(x, memory, sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6)


def test_banded_recurrent_consistency():
    """Stepwise rollout with the single-step cell must match the banded
    sequence evaluation (the framework's key recurrent invariant)."""
    x, done, memory = make_inputs(t_len=48)
    module = make_module(mode="banded")
    seq_out, _, _ = module(x, memory, sequential=True, done=done)

    from cusrl_tpu.nn.base import reset_memory

    outs = []
    mem = memory
    for t in range(x.shape[0]):
        out, mem, _ = module(x[t], mem)
        outs.append(out)
        mem = reset_memory(mem, done[t])
    step_out = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(seq_out), np.asarray(step_out), rtol=1e-4, atol=1e-5)
