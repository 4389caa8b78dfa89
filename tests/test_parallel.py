"""Sharding tests on the virtual 8-device CPU mesh: DP training must be
numerically equivalent to single-device training; TP placement must execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.parallel.sharding import distribute_agent, get_mesh, replicate, shard_batch
from cusrl_tpu.template.rollout import ScanRolloutDriver


def make_agent(seed=0, **kwargs):
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0  # identical construction streams across calls
    env = VelocityLocomotionEnv(num_instances=32, observation_dim=16, action_dim=4, seed=1)
    defaults = dict(
        num_steps_per_update=8,
        actor_hidden_dims=(32, 32),
        critic_hidden_dims=(32, 32),
        sampler_epochs=2,
        sampler_mini_batches=2,
        normalize_observation=True,
    )
    defaults.update(kwargs)
    agent = cusrl_tpu.PpoAgentFactory(**defaults)(env.spec)
    return env, agent


def run_iters(env, agent, n=2):
    driver = ScanRolloutDriver(agent, env)
    for _ in range(n):
        driver.collect_and_update(agent.num_steps_per_update)
    jax.block_until_ready(agent.state)
    return np.asarray(agent.state.actor.backbone.layers[0].weight)


def test_dp_training_matches_single_device():
    env1, agent1 = make_agent()
    w_single = run_iters(env1, agent1)

    env2, agent2 = make_agent()
    distribute_agent(agent2, get_mesh(1))
    w_sharded = run_iters(env2, agent2)

    np.testing.assert_allclose(w_single, w_sharded, atol=2e-5)


def test_tensor_parallel_executes():
    env, agent = make_agent()
    mesh = get_mesh(model_parallel_size=2)
    distribute_agent(agent, mesh, tensor_parallel=True)
    with jax.set_mesh(mesh):
        w = run_iters(env, agent, n=1)
    assert np.isfinite(w).all()


def test_tp_training_matches_single_device():
    """TP must be numerically equivalent to single-device training — the
    alternating row/column partition only changes WHERE the matmuls run, not
    what they compute (XLA inserts the psum at the sharding boundary)."""
    env1, agent1 = make_agent()
    w_single = run_iters(env1, agent1)

    env2, agent2 = make_agent()
    mesh = get_mesh(model_parallel_size=8)  # pure TP: 1 x 8
    distribute_agent(agent2, mesh, tensor_parallel=True)
    with jax.set_mesh(mesh):
        w_tp = run_iters(env2, agent2)

    np.testing.assert_allclose(w_single, w_tp, atol=5e-5)


def test_tp_dp_combined_matches_single_device():
    """The full 4x2 (data x model) mesh must also reproduce single-device
    numerics end-to-end through the fused collect_and_update path."""
    env1, agent1 = make_agent()
    w_single = run_iters(env1, agent1)

    env2, agent2 = make_agent()
    mesh = get_mesh(model_parallel_size=2)
    distribute_agent(agent2, mesh, tensor_parallel=True)
    with jax.set_mesh(mesh):
        w_both = run_iters(env2, agent2)

    np.testing.assert_allclose(w_single, w_both, atol=5e-5)


def test_shard_batch_and_replicate_placement():
    mesh = get_mesh(1)
    x = jnp.zeros((16, 4))
    sharded = shard_batch(x, mesh)
    assert len(sharded.sharding.device_set) == 8
    replicated = replicate(x, mesh)
    assert replicated.sharding.is_fully_replicated


# ---------------------------------------------------------------------------
# Pallas kernels under a pure-DP mesh (shard_map wrappers): numerics must match
# the single-device kernel exactly, with weight grads psum'd over 'data'.
# ---------------------------------------------------------------------------


def _mk_mlp_params(key, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32) / np.sqrt(dims[i]))
        bs.append(jax.random.normal(k2, (1, dims[i + 1]), jnp.float32) * 0.1)
    return tuple(ws), tuple(bs)


def test_kernel_mesh_status():
    from cusrl_tpu.nn.kernels.fused_mlp import kernel_mesh_status

    assert kernel_mesh_status(1024) == (True, None)
    dp = get_mesh(1)  # 8 x 1 (data x model)
    with jax.set_mesh(dp):
        allowed, wrap = kernel_mesh_status(1024)
        assert allowed and wrap is not None
        # rows not divisible by data size -> XLA chain
        assert kernel_mesh_status(1023) == (False, None)
    tp = get_mesh(model_parallel_size=2)
    with jax.set_mesh(tp):
        assert kernel_mesh_status(1024) == (False, None)


def test_fused_mlp_pair_kernel_on_dp_mesh_matches_single_device():
    from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair

    dims = (24, 64, 32)
    wsa, bsa = _mk_mlp_params(jax.random.key(70), dims)
    wsc, bsc = _mk_mlp_params(jax.random.key(71), dims)
    xa = jax.random.normal(jax.random.key(72), (128, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(73), (128, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.key(74), (128, dims[-1]), jnp.float32)

    def loss(params, xa_, xc_):
        (wa, ba), (wc, bc) = params
        a, c = fused_mlp_pair(
            xa_, xc_, wa, ba, wc, bc, "elu", True,
            use_pallas=True, block_rows=32, interpret=True,
        )
        return jnp.mean(jnp.square(a.astype(jnp.float32) - tgt)) + jnp.mean(
            jnp.square(c.astype(jnp.float32) - 2.0 * tgt)
        )

    params = ((wsa, bsa), (wsc, bsc))
    l_single, g_single = jax.value_and_grad(loss)(params, xa, xc)

    mesh = get_mesh(1)
    with jax.set_mesh(mesh):
        xa_s = shard_batch(xa, mesh)
        xc_s = shard_batch(xc, mesh)
        params_s = replicate(params, mesh)
        l_mesh, g_mesh = jax.jit(jax.value_and_grad(loss))(params_s, xa_s, xc_s)

    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_single), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_fused_ppo_step_kernel_on_dp_mesh_matches_single_device():
    from cusrl_tpu.nn.kernels.fused_ppo_step import fused_ppo_step

    dims = (24, 64, 32)
    a_dim = 6
    wsa, bsa = _mk_mlp_params(jax.random.key(80), dims)
    wsc, bsc = _mk_mlp_params(jax.random.key(81), dims)
    wm = jax.random.normal(jax.random.key(82), (dims[-1], a_dim), jnp.float32) * 0.2
    bm = jnp.zeros((1, a_dim), jnp.float32)
    wv = jax.random.normal(jax.random.key(83), (dims[-1], 1), jnp.float32) * 0.2
    bv = jnp.zeros((1, 1), jnp.float32)
    std = jnp.ones((a_dim,), jnp.float32)
    n = 128
    xa = jax.random.normal(jax.random.key(84), (n, 24), jnp.float32)
    xc = jax.random.normal(jax.random.key(85), (n, 24), jnp.float32)
    action = jax.random.normal(jax.random.key(86), (n, a_dim), jnp.float32)
    old_logp = jax.random.normal(jax.random.key(87), (n, 1), jnp.float32) * 0.1 - 6.0
    advantage = jax.random.normal(jax.random.key(88), (n, 1), jnp.float32)
    returns = jax.random.normal(jax.random.key(89), (n, 1), jnp.float32)

    def loss(params, data):
        (wa, ba), (wc, bc), (wm_, bm_, wv_, bv_, std_) = params
        xa_, xc_, action_, old_logp_, advantage_, returns_ = data
        out, _ = fused_ppo_step(
            xa_, xc_, wa, ba, wc, bc, wm_, bm_, wv_, bv_, std_,
            action_, old_logp_, advantage_, None, returns_,
            0.2, 1.0, 0.5, "elu", True,
            loss_clip=None, use_pallas=True, block_rows=32, interpret=True,
        )
        return out

    params = ((wsa, bsa), (wsc, bsc), (wm, bm, wv, bv, std))
    data = (xa, xc, action, old_logp, advantage, returns)
    l_single, g_single = jax.value_and_grad(loss)(params, data)

    mesh = get_mesh(1)
    with jax.set_mesh(mesh):
        data_s = tuple(shard_batch(d, mesh) for d in data)
        params_s = replicate(params, mesh)
        l_mesh, g_mesh = jax.jit(jax.value_and_grad(loss))(params_s, data_s)

    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_single), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Hierarchical (dcn, data) meshes (VERDICT r4 item 5): pure DP with the slow
# axis named explicitly — batches shard over BOTH axes, kernels stay engaged,
# weight grads psum over (dcn, data), numerics == single-device.
# ---------------------------------------------------------------------------


def test_kernel_mesh_status_hierarchical():
    from cusrl_tpu.nn.kernels.fused_mlp import kernel_mesh_status

    mesh = get_mesh(1, dcn_parallel_size=2)  # (2, 4, 1) dcn x data x model
    assert mesh.axis_names == ("dcn", "data", "model")
    with jax.set_mesh(mesh):
        allowed, wrap = kernel_mesh_status(1024)
        assert allowed and wrap is not None
        # rows must divide dcn*data = 8
        assert kernel_mesh_status(1023) == (False, None)


def test_fused_mlp_pair_kernel_on_hierarchical_mesh_matches_single_device():
    from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair

    dims = (24, 64, 32)
    wsa, bsa = _mk_mlp_params(jax.random.key(80), dims)
    wsc, bsc = _mk_mlp_params(jax.random.key(81), dims)
    xa = jax.random.normal(jax.random.key(82), (128, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(83), (128, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.key(84), (128, dims[-1]), jnp.float32)

    def loss(params, xa_, xc_):
        (wa, ba), (wc, bc) = params
        a, c = fused_mlp_pair(
            xa_, xc_, wa, ba, wc, bc, "elu", True,
            use_pallas=True, block_rows=32, interpret=True,
        )
        return jnp.mean(jnp.square(a.astype(jnp.float32) - tgt)) + jnp.mean(
            jnp.square(c.astype(jnp.float32) - 2.0 * tgt)
        )

    params = ((wsa, bsa), (wsc, bsc))
    l_single, g_single = jax.value_and_grad(loss)(params, xa, xc)

    mesh = get_mesh(1, dcn_parallel_size=2)
    with jax.set_mesh(mesh):
        xa_s = shard_batch(xa, mesh)
        assert "dcn" in str(xa_s.sharding.spec)
        xc_s = shard_batch(xc, mesh)
        params_s = replicate(params, mesh)
        l_mesh, g_mesh = jax.jit(jax.value_and_grad(loss))(params_s, xa_s, xc_s)

    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_single), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_fused_block_kernels_on_hierarchical_mesh_match_single_device():
    from cusrl_tpu.nn.kernels.fused_block import fused_block_post, fused_block_pre

    keys = jax.random.split(jax.random.key(90), 10)
    E, F, IN = 32, 64, 24
    w_in = jax.random.normal(keys[0], (IN, E)) / np.sqrt(IN)
    b_in = 0.1 * jax.random.normal(keys[1], (1, E))
    g1, bb1 = 1.0 + 0.1 * jax.random.normal(keys[2], (1, E)), 0.1 * jax.random.normal(keys[3], (1, E))
    w_qkv = jax.random.normal(keys[4], (E, 3 * E)) / np.sqrt(E)
    b_qkv = 0.1 * jax.random.normal(keys[5], (1, 3 * E))
    x = jax.random.normal(keys[6], (128, IN))
    tgt = jax.random.normal(keys[7], (128, 3 * E))

    def loss(params, x_):
        w_in_, b_in_, g1_, bb1_, w_qkv_, b_qkv_ = params
        h, qkv = fused_block_pre(
            x_, w_in_, b_in_, g1_, bb1_, w_qkv_, b_qkv_,
            use_pallas=True, block_rows=32, interpret=True,
        )
        return jnp.mean(jnp.square(qkv.astype(jnp.float32) - tgt)) + jnp.mean(h.astype(jnp.float32) ** 2)

    params = (w_in, b_in, g1, bb1, w_qkv, b_qkv)
    l_single, g_single = jax.value_and_grad(loss)(params, x)
    mesh = get_mesh(1, dcn_parallel_size=2)
    with jax.set_mesh(mesh):
        l_mesh, g_mesh = jax.jit(jax.value_and_grad(loss))(replicate(params, mesh), shard_batch(x, mesh))
    np.testing.assert_allclose(np.asarray(l_mesh), np.asarray(l_single), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_mesh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_tp_fallback_warns_once():
    """Model-axis sharding must announce the Pallas->XLA fallback loudly,
    exactly once per process (VERDICT r4 item 6)."""
    import warnings as _warnings

    from cusrl_tpu.nn.kernels import fused_mlp as fm

    fm._tp_fallback_warned = False
    tp = get_mesh(model_parallel_size=2)
    with jax.set_mesh(tp):
        with pytest.warns(UserWarning, match="disables the fused Pallas kernels"):
            assert fm.kernel_mesh_status(1024) == (False, None)
        # Second query: silent.
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")
            assert fm.kernel_mesh_status(1024) == (False, None)
