"""Ring K/V attention memory semantics: cursor wraparound, global-leaf reset
rules, storable broadcasting, unroll correctness, and dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np

from cusrl_tpu.nn.base import reset_memory, storable_memory
from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory


def make_attn(window=4, embed=16, heads=2, dtype=None):
    layer = CausalTransformerEncoderLayerFactory(
        embed_dim=embed, num_heads=heads, window=window, compute_dtype=dtype
    )(embed, None, jax.random.key(0))
    return layer.attention


def test_cursor_wraps_and_outputs_stay_consistent_across_many_steps():
    """Stepping far past the ring size must keep matching a fresh scan replay
    of the last window (cursor arithmetic is modular)."""
    attn = make_attn(window=3)
    n, steps = 2, 17  # ring has 4 slots; 17 steps = 4 wraps + 1
    xs = jax.random.normal(jax.random.key(1), (steps, n, attn.input_dim))
    memory = attn.init_memory(n)
    outs = []
    for t in range(steps):
        out, memory, _ = attn(xs[t], memory)
        outs.append(out)
    assert int(memory["cursor"]) == steps % (attn.window + 1)
    # Replay the whole prefix through the scan cell from scratch: the final
    # step's output must match (window semantics independent of wrap count).
    seq_out, _, _ = attn.replace(sequence_mode="scan")(
        xs, attn.init_memory(n), sequential=True, done=jnp.zeros((steps, n, 1), bool)
    )
    np.testing.assert_allclose(np.asarray(outs[-1]), np.asarray(seq_out[-1]), atol=1e-5)


def test_reset_memory_preserves_global_cursor_and_zeroes_the_rest():
    attn = make_attn()
    memory = attn.init_memory(3)
    for t in range(3):
        _, memory, _ = attn(jax.random.normal(jax.random.key(10 + t), (3, attn.input_dim)), memory)
    done = jnp.asarray([[True], [False], [True]])
    reset = reset_memory(memory, done)
    assert reset["cursor"].ndim == 0 and int(reset["cursor"]) == int(memory["cursor"])
    assert np.allclose(np.asarray(reset["cache_mask"])[0], 0.0)
    np.testing.assert_array_equal(np.asarray(reset["cache_mask"])[1], np.asarray(memory["cache_mask"])[1])
    assert np.allclose(np.asarray(reset["k_cache"])[2], 0.0)


def test_storable_memory_broadcasts_rank0_leaves_and_module_reads_them_back():
    attn = make_attn()
    memory = attn.init_memory(4)
    _, memory, _ = attn(jnp.ones((4, attn.input_dim)), memory)
    stored = storable_memory(memory, 4)
    assert stored["cursor"].shape == (4,)
    # A module consuming the broadcast form must behave identically.
    out_scalar, _, _ = attn(jnp.ones((4, attn.input_dim)), memory)
    out_stored, _, _ = attn(jnp.ones((4, attn.input_dim)), stored)
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_stored), atol=1e-6)


def test_unrolled_cache_orders_slots_chronologically():
    attn = make_attn(window=3)
    n = 1
    memory = attn.init_memory(n)
    tokens = [jax.random.normal(jax.random.key(20 + t), (n, attn.input_dim)) for t in range(5)]
    for x in tokens:
        _, memory, _ = attn(x, memory)
    k_chron, v_chron, mask = attn._unrolled_cache(memory)
    assert k_chron.shape[2] == attn.window and bool(jnp.all(mask == 1.0))
    # Newest slot (last) must equal the projection of the LAST token.
    k_last, v_last = attn.mha.project_kv_raw(tokens[-1][:, None])
    np.testing.assert_allclose(np.asarray(k_chron[:, :, -1]), np.asarray(k_last[:, :, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_chron[:, :, -1]), np.asarray(v_last[:, :, 0]), atol=1e-5)


def test_ring_dtype_follows_projection_compute_dtype():
    fp32 = make_attn(dtype=None).init_memory(2)
    bf16 = make_attn(dtype="bfloat16").init_memory(2)
    assert fp32["k_cache"].dtype == jnp.float32
    assert bf16["k_cache"].dtype == jnp.bfloat16
    assert bf16["cache_mask"].dtype == jnp.float32  # masks stay fp32
    assert bf16["cursor"].dtype == jnp.int32


def test_sequence_final_memory_is_canonical_cursor_zero():
    attn = make_attn(window=3)
    t, n = 6, 2
    xs = jax.random.normal(jax.random.key(30), (t, n, attn.input_dim))
    out, mem, _ = attn(xs, attn.init_memory(n), sequential=True, done=jnp.zeros((t, n, 1), bool))
    assert int(jnp.reshape(mem["cursor"], (-1,))[0]) == 0
    # Continuing stepwise from the canonical memory matches continuing from a
    # pure-scan replay's (rotated) memory.
    scan_out, scan_mem, _ = attn.replace(sequence_mode="scan")(
        xs, attn.init_memory(n), sequential=True, done=jnp.zeros((t, n, 1), bool)
    )
    nxt = jax.random.normal(jax.random.key(31), (n, attn.input_dim))
    a, _, _ = attn(nxt, mem)
    b, _, _ = attn(nxt, scan_mem)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
