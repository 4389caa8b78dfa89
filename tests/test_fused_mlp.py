"""Fused MLP kernel correctness: Pallas (interpret) vs XLA reference vs Mlp.

Counterpart role: the reference trusts torch.compile for backbone fusion
(cusrl/template/agent.py:119); here the fused kernel must match the unfused
path in both outputs and parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.kernels.fused_mlp import _reference, fused_mlp


def make_params(key, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32) / np.sqrt(dims[i]))
        bs.append(jax.random.normal(k2, (1, dims[i + 1]), jnp.float32) * 0.1)
    return tuple(ws), tuple(bs)


@pytest.mark.parametrize("activation", ["elu", "relu", "tanh", "gelu"])
@pytest.mark.parametrize("trailing", [True, False])
def test_fused_mlp_forward_matches_reference(activation, trailing):
    dims = (24, 64, 32)
    ws, bs = make_params(jax.random.key(0), dims)
    x = jax.random.normal(jax.random.key(1), (100, dims[0]), jnp.float32)

    expected = _reference(x, ws, bs, activation, trailing)
    got = fused_mlp(x, ws, bs, activation, trailing, use_pallas=True, block_rows=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), atol=2e-2, rtol=2e-2
    )


@pytest.mark.parametrize("activation", ["elu", "tanh", "gelu"])
def test_fused_mlp_gradients_match_reference(activation):
    dims = (24, 64, 32)
    ws, bs = make_params(jax.random.key(2), dims)
    x = jax.random.normal(jax.random.key(3), (100, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.key(4), (100, dims[-1]), jnp.float32)

    def loss_ref(params, x_):
        ws_, bs_ = params
        out = _reference(x_, ws_, bs_, activation, True)
        return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

    def loss_fused(params, x_):
        ws_, bs_ = params
        out = fused_mlp(x_, ws_, bs_, activation, True, use_pallas=True, block_rows=32, interpret=True)
        return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

    (g_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))((ws, bs), x)
    (g_fused, gx_fused) = jax.grad(loss_fused, argnums=(0, 1))((ws, bs), x)

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-3, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref), atol=3e-3, rtol=3e-2)


def test_fused_mlp_fallback_path_gradients():
    """use_pallas=False (the non-TPU fallback) must also produce reference
    gradients through the custom_vjp (regression: the fallback once rebuilt
    the chain with zero biases)."""
    dims = (24, 64, 32)
    ws, bs = make_params(jax.random.key(10), dims)
    x = jax.random.normal(jax.random.key(11), (50, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.key(12), (50, dims[-1]), jnp.float32)

    def loss(fn):
        return lambda params: jnp.mean(
            jnp.square(fn(x, params[0], params[1]).astype(jnp.float32) - tgt)
        )

    g_ref = jax.grad(loss(lambda x_, w_, b_: _reference(x_, w_, b_, "elu", True)))((ws, bs))
    g_fb = jax.grad(loss(lambda x_, w_, b_: fused_mlp(x_, w_, b_, "elu", True, use_pallas=False)))((ws, bs))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_fused_mlp_ragged_rows_and_single_layer():
    """Row counts that don't divide the block size must pad transparently."""
    dims = (8, 16)
    ws, bs = make_params(jax.random.key(5), dims)
    x = jax.random.normal(jax.random.key(6), (37, dims[0]), jnp.float32)
    expected = _reference(x, ws, bs, "elu", True)
    got = fused_mlp(x, ws, bs, "elu", True, use_pallas=True, block_rows=16, interpret=True)
    assert got.shape == (37, 16)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(expected, np.float32), atol=2e-2)


def test_fused_mlp_pair_matches_two_single_calls():
    """fused_mlp_pair (one kernel for both nets) must equal two independent
    fused_mlp calls in outputs AND parameter/input gradients."""
    from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair

    dims = (24, 64, 32)
    wsa, bsa = make_params(jax.random.key(20), dims)
    wsc, bsc = make_params(jax.random.key(21), dims)
    xa = jax.random.normal(jax.random.key(22), (100, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(23), (100, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.key(24), (100, dims[-1]), jnp.float32)

    out_a, out_c = fused_mlp_pair(
        xa, xc, wsa, bsa, wsc, bsc, "elu", True, use_pallas=True, block_rows=32, interpret=True
    )
    ref_a = _reference(xa, wsa, bsa, "elu", True)
    ref_c = _reference(xc, wsc, bsc, "elu", True)
    np.testing.assert_allclose(np.asarray(out_a, np.float32), np.asarray(ref_a, np.float32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_c, np.float32), np.asarray(ref_c, np.float32), atol=2e-2)

    def loss_pair(params, xa_, xc_):
        (wa, ba), (wc, bc) = params
        a, c = fused_mlp_pair(xa_, xc_, wa, ba, wc, bc, "elu", True,
                              use_pallas=True, block_rows=32, interpret=True)
        return jnp.mean(jnp.square(a.astype(jnp.float32) - tgt)) + jnp.mean(
            jnp.square(c.astype(jnp.float32) - 2.0 * tgt))

    def loss_ref(params, xa_, xc_):
        (wa, ba), (wc, bc) = params
        a = _reference(xa_, wa, ba, "elu", True)
        c = _reference(xc_, wc, bc, "elu", True)
        return jnp.mean(jnp.square(a.astype(jnp.float32) - tgt)) + jnp.mean(
            jnp.square(c.astype(jnp.float32) - 2.0 * tgt))

    params = ((wsa, bsa), (wsc, bsc))
    g_pair = jax.grad(loss_pair, argnums=(0, 1, 2))(params, xa, xc)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, xa, xc)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-3, rtol=3e-2)


def test_fused_mlp_reference_matches_mlp_module():
    """The kernel's XLA reference and the Mlp module produce identical outputs
    (same cast placement), so swapping the backbone onto the kernel preserves
    the module contract."""
    from cusrl_tpu.nn.module.mlp import MlpFactory

    factory = MlpFactory(hidden_dims=(64, 32), activation="elu", ends_with_activation=True)
    mlp = factory(24, None, jax.random.key(7))
    x = jax.random.normal(jax.random.key(8), (50, 24), jnp.float32)
    out_module, _, _ = mlp(x)

    ws = tuple(layer.weight.T for layer in mlp.layers)
    bs = tuple(layer.bias[None, :] for layer in mlp.layers)
    out_ref = _reference(x, ws, bs, "elu", True)
    np.testing.assert_allclose(
        np.asarray(out_ref, np.float32), np.asarray(out_module, np.float32), atol=1e-6
    )


def test_fused_mlp_pair_skip_input_grad():
    """With skip_input_grad=True the pair kernel must keep parameter gradients
    identical while returning zero input cotangents (observations are data)."""
    import jax

    from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair

    dims = (24, 64, 32)
    wsa, bsa = make_params(jax.random.key(30), dims)
    wsc, bsc = make_params(jax.random.key(31), dims)
    xa = jax.random.normal(jax.random.key(32), (96, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(33), (96, dims[0]), jnp.float32)
    tgt = jax.random.normal(jax.random.key(34), (96, dims[-1]), jnp.float32)

    def loss(skip):
        def fn(params, xa_, xc_):
            (wa, ba), (wc, bc) = params
            a, c = fused_mlp_pair(
                xa_, xc_, wa, ba, wc, bc, "elu", True,
                use_pallas=True, block_rows=32, interpret=True, skip_input_grad=skip,
            )
            return jnp.mean(jnp.square(a.astype(jnp.float32) - tgt)) + jnp.mean(
                jnp.square(c.astype(jnp.float32) - 2.0 * tgt)
            )

        return fn

    params = ((wsa, bsa), (wsc, bsc))
    g_full = jax.grad(loss(False), argnums=(0, 1, 2))(params, xa, xc)
    g_skip = jax.grad(loss(True), argnums=(0, 1, 2))(params, xa, xc)
    # Parameter grads identical.
    for a, b in zip(jax.tree.leaves(g_full[0]), jax.tree.leaves(g_skip[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Input cotangents are declared-zero.
    assert not np.any(np.asarray(g_skip[1]))
    assert not np.any(np.asarray(g_skip[2]))
    # ...and the full path's input grads are real (sanity).
    assert np.any(np.asarray(g_full[1]))


def _head_params(key, latent, a_dim, v_dim):
    import jax

    k1, k2, k3, k4 = jax.random.split(key, 4)
    wm = jax.random.normal(k1, (latent, a_dim), jnp.float32) * 0.2
    bm = jax.random.normal(k2, (1, a_dim), jnp.float32) * 0.1
    wv = jax.random.normal(k3, (latent, v_dim), jnp.float32) * 0.2
    bv = jax.random.normal(k4, (1, v_dim), jnp.float32) * 0.1
    return wm, bm, wv, bv


def test_fused_mlp_pair_heads_matches_reference():
    """Head-fused kernel (backbones + fp32 mean/value heads in one pallas
    program) must match the XLA reference in outputs and every parameter
    gradient, with and without the exposed-latent output."""
    import jax

    from cusrl_tpu.nn.kernels.fused_mlp import _heads_reference, fused_mlp_pair_heads

    dims = (24, 64, 32)
    wsa, bsa = make_params(jax.random.key(40), dims)
    wsc, bsc = make_params(jax.random.key(41), dims)
    wm, bm, wv, bv = _head_params(jax.random.key(42), dims[-1], 6, 1)
    xa = jax.random.normal(jax.random.key(43), (96, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(44), (96, dims[0]), jnp.float32)
    adv = jax.random.normal(jax.random.key(45), (96, 6), jnp.float32)

    for expose in (False, True):
        out = fused_mlp_pair_heads(
            xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, "elu", True,
            use_pallas=True, block_rows=32, interpret=True, expose_latent=expose,
        )
        ref = _heads_reference(xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, "elu", True, expose)
        for got, want in zip(out, ref):
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2, rtol=2e-2
            )

        def loss(params, use_kernel):
            (wa_, ba_), (wc_, bc_), (wm_, bm_, wv_, bv_) = params
            if use_kernel:
                res = fused_mlp_pair_heads(
                    xa, xc, wa_, ba_, wc_, bc_, wm_, bm_, wv_, bv_, "elu", True,
                    use_pallas=True, block_rows=32, interpret=True, expose_latent=expose,
                )
            else:
                res = _heads_reference(xa, xc, wa_, ba_, wc_, bc_, wm_, bm_, wv_, bv_, "elu", True, expose)
            mean, value = res[0], res[1]
            total = jnp.mean(mean * adv) + jnp.mean(jnp.square(value - 1.0))
            if expose:
                total = total + jnp.mean(res[2].astype(jnp.float32) ** 2)
            return total

        params = ((wsa, bsa), (wsc, bsc), (wm, bm, wv, bv))
        g_kernel = jax.grad(lambda p: loss(p, True))(params)
        g_ref = jax.grad(lambda p: loss(p, False))(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_kernel)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3, rtol=3e-2)


def test_fused_mlp_pair_heads_multi_output_value():
    """Multi-reward critics have value_dim > 1: the backward kernel must use a
    real contraction for the critic latent cotangent (advisor round-2 finding:
    the outer-product shortcut only covers single-output heads)."""
    import jax

    from cusrl_tpu.nn.kernels.fused_mlp import _heads_reference, fused_mlp_pair_heads

    dims = (24, 64, 32)
    wsa, bsa = make_params(jax.random.key(50), dims)
    wsc, bsc = make_params(jax.random.key(51), dims)
    wm, bm, wv, bv = _head_params(jax.random.key(52), dims[-1], 6, 3)
    xa = jax.random.normal(jax.random.key(53), (96, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(54), (96, dims[0]), jnp.float32)
    adv = jax.random.normal(jax.random.key(55), (96, 6), jnp.float32)
    vtgt = jax.random.normal(jax.random.key(56), (96, 3), jnp.float32)

    def loss(params, use_kernel):
        (wa_, ba_), (wc_, bc_), (wm_, bm_, wv_, bv_) = params
        if use_kernel:
            res = fused_mlp_pair_heads(
                xa, xc, wa_, ba_, wc_, bc_, wm_, bm_, wv_, bv_, "elu", True,
                use_pallas=True, block_rows=32, interpret=True,
            )
        else:
            res = _heads_reference(xa, xc, wa_, ba_, wc_, bc_, wm_, bm_, wv_, bv_, "elu", True, False)
        mean, value = res[0], res[1]
        return jnp.mean(mean * adv) + jnp.mean(jnp.square(value - vtgt))

    params = ((wsa, bsa), (wsc, bsc), (wm, bm, wv, bv))
    out_kernel = fused_mlp_pair_heads(
        xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, "elu", True,
        use_pallas=True, block_rows=32, interpret=True,
    )
    assert out_kernel[1].shape == (96, 3)
    g_kernel = jax.grad(lambda p: loss(p, True))(params)
    g_ref = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_kernel)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3, rtol=3e-2)


def test_fused_mlp_pair_heads_primal_latent_unpadded():
    """Primal-only (no-grad) expose_latent calls must truncate the actor latent
    to the true row count, matching the vjp-fwd path (advisor round-2 finding:
    the padded latent leaked through on non-tile-multiple batches)."""
    import jax

    from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair_heads

    dims = (24, 64, 32)
    wsa, bsa = make_params(jax.random.key(60), dims)
    wsc, bsc = make_params(jax.random.key(61), dims)
    wm, bm, wv, bv = _head_params(jax.random.key(62), dims[-1], 6, 1)
    xa = jax.random.normal(jax.random.key(63), (40, dims[0]), jnp.float32)
    xc = jax.random.normal(jax.random.key(64), (40, dims[0]), jnp.float32)

    mean, value, latent = fused_mlp_pair_heads(
        xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, "elu", True,
        use_pallas=True, block_rows=32, interpret=True, expose_latent=True,
    )
    assert mean.shape[0] == 40 and value.shape[0] == 40
    assert latent.shape[0] == 40


def test_gelu_trailing_falls_back_to_reference():
    """gelu saves pre-activations, which the trailing-output slot cannot hold:
    supports_fused_mlp must reject it so fused_mlp routes to the XLA chain."""
    from cusrl_tpu.nn.kernels.fused_mlp import supports_fused_mlp

    assert supports_fused_mlp("gelu", 2, False)
    assert not supports_fused_mlp("gelu", 2, True)
    dims = (8, 16, 8)
    ws, bs = make_params(jax.random.key(7), dims)
    x = jax.random.normal(jax.random.key(8), (64, dims[0]), jnp.float32)
    got = fused_mlp(x, ws, bs, "gelu", True, use_pallas=True, block_rows=32, interpret=True)
    expected = _reference(x, ws, bs, "gelu", True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(expected, np.float32), atol=2e-2, rtol=2e-2)


def test_feedforward_fused_path_matches_unfused(monkeypatch):
    """FeedForward routes through the fused kernel on TPU; force the guard on
    CPU (interpret) and compare against the plain up->gelu->down chain."""
    from cusrl_tpu.nn.layer import mha as mha_mod
    from cusrl_tpu.nn.layer.mha import FeedForward

    ff = FeedForward.init(jax.random.key(9), 32, 64, compute_dtype="bfloat16")
    x = jax.random.normal(jax.random.key(10), (300, 32), jnp.bfloat16)

    plain = ff.replace(glu=False)
    assert not plain._can_fuse(x) or jax.default_backend() == "tpu"  # CPU: guard off
    unfused = plain(x)

    monkeypatch.setattr(FeedForward, "_can_fuse", lambda self, _x: True)
    import cusrl_tpu.nn.kernels.fused_mlp as fm

    orig = fm.fused_mlp
    monkeypatch.setattr(
        fm, "fused_mlp",
        lambda *a, **k: orig(*a, **{**k, "use_pallas": True, "interpret": True, "block_rows": 64}),
    )
    fused = plain(x)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(unfused, np.float32), atol=3e-2, rtol=3e-2
    )
