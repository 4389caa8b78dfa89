"""Round-2 unit breadth: TreePacker, distributions, MHA, environment-spec
hooks, CLI override parsing, Linear precision semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.utils.packing import TreePacker


# -- TreePacker ---------------------------------------------------------------


def make_tree():
    return {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (jnp.ones((4,), jnp.int32), jnp.zeros((2, 2), jnp.float32)),
        "key": jax.random.key(7),
        "flag": jnp.asarray(True),
    }


def test_tree_packer_roundtrip_identity():
    tree = make_tree()
    packer = TreePacker(tree)
    packed = packer.pack(tree)
    restored = packer.unpack(packed)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        if jnp.issubdtype(jnp.asarray(a).dtype, jax.dtypes.prng_key):
            np.testing.assert_array_equal(jax.random.key_data(a), jax.random.key_data(b))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert jnp.asarray(a).dtype == jnp.asarray(b).dtype


def test_tree_packer_groups_by_dtype():
    tree = make_tree()
    packer = TreePacker(tree)
    packed = packer.pack(tree)
    # One flat buffer per transport dtype (f32, i32, bool, key-data uint32).
    assert len(jax.tree.leaves(packed)) == len(packer.group_sizes)


def test_tree_packer_prng_key_stream_survives():
    tree = {"key": jax.random.key(3)}
    packer = TreePacker(tree)
    restored = packer.unpack(packer.pack(tree))
    a = jax.random.normal(tree["key"], (4,))
    b = jax.random.normal(restored["key"], (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tree_packer_works_under_jit():
    tree = make_tree()
    packer = TreePacker(tree)

    @jax.jit
    def roundtrip(t):
        return packer.unpack(packer.pack(t))

    restored = roundtrip(tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))


def test_tree_packer_big_leaf_passthrough():
    # Leaves >= passthrough_bytes travel as their own arguments (no flatten /
    # concat round-trip); the roundtrip stays exact and the big leaf keeps its
    # dtype entry out of the grouped buffers.
    tree = make_tree()
    tree["ring"] = jnp.arange(512 * 600, dtype=jnp.float32).reshape(512, 600)  # 1.2 MB
    packer = TreePacker(tree)
    buffers = packer.pack(tree)
    assert any(name.startswith("__big") for name in buffers)
    big = [v for kk, v in buffers.items() if kk.startswith("__big")]
    assert big[0].shape == (512, 600)
    assert buffers["float32"].size < 100  # small leaves only
    restored = packer.unpack(buffers)
    np.testing.assert_array_equal(np.asarray(restored["ring"]), np.asarray(tree["ring"]))
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))


# -- distributions ------------------------------------------------------------


def test_normal_dist_sample_statistics():
    from cusrl_tpu.nn.module.distribution import NormalDistFactory

    dist = NormalDistFactory()(8, 3, jax.random.key(0))
    feat = jnp.zeros((20000, 8), jnp.float32)
    params = dist(feat)
    sample, logp = dist.sample(params, jax.random.key(1))
    mean_err = float(jnp.max(jnp.abs(jnp.mean(sample, 0) - jnp.mean(params["mean"], 0))))
    assert mean_err < 0.05
    std = float(jnp.mean(jnp.std(sample, axis=0)))
    expected_std = float(jnp.mean(params["std"]))
    assert abs(std - expected_std) < 0.05 * expected_std
    # logp consistency
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(dist.compute_logp(params, sample)), atol=1e-5
    )


def test_adaptive_normal_dist_state_dependent_std():
    from cusrl_tpu.nn.module.distribution import AdaptiveNormalDistFactory

    dist = AdaptiveNormalDistFactory()(8, 3, jax.random.key(0))
    # The std head initializes to a constant std; give it nonzero weights to
    # exercise the state-dependent path.
    dist = dist.replace(
        std_head=dist.std_head.replace(
            weight=jax.random.normal(jax.random.key(2), dist.std_head.weight.shape) * 0.3
        )
    )
    feat = jax.random.normal(jax.random.key(1), (16, 8)) * 3.0
    params = dist(feat)
    assert params["std"].shape == (16, 3)
    # std must vary with the input (state-dependent), unlike NormalDist.
    assert float(jnp.std(params["std"], axis=0).max()) > 1e-3
    assert float(params["std"].min()) > 0  # bijector keeps std positive


def test_onehot_categorical_mode_and_kl():
    from cusrl_tpu.nn.module.distribution import OneHotCategoricalDistFactory

    dist = OneHotCategoricalDistFactory()(4, 4, jax.random.key(0))
    feat = jax.random.normal(jax.random.key(1), (1, 4))
    params = dist(feat)
    mode = dist.mode(params)
    assert int(jnp.argmax(mode)) == int(jnp.argmax(params["logits"]))
    kl = dist.compute_kl_div(params, params)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_normal_kl_asymmetry_and_zero():
    from cusrl_tpu.nn.module.distribution import NormalDistFactory

    dist = NormalDistFactory()(4, 2, jax.random.key(0))
    p = {"mean": jnp.zeros((1, 2)), "std": jnp.ones((1, 2))}
    q = {"mean": jnp.ones((1, 2)) * 0.5, "std": jnp.ones((1, 2)) * 2.0}
    np.testing.assert_allclose(np.asarray(dist.compute_kl_div(p, p)), 0.0, atol=1e-6)
    assert float(dist.compute_kl_div(p, q).sum()) > 0
    assert not np.allclose(
        np.asarray(dist.compute_kl_div(p, q)), np.asarray(dist.compute_kl_div(q, p))
    )


# -- MHA ----------------------------------------------------------------------


def test_mha_mask_blocks_attention():
    from cusrl_tpu.nn.layer.mha import MultiheadAttention

    mha = MultiheadAttention.init(jax.random.key(0), 16, 2, compute_dtype=None)
    q = jax.random.normal(jax.random.key(1), (2, 3, 16))
    kv = jax.random.normal(jax.random.key(2), (2, 5, 16))
    full = mha(q, kv, mask=jnp.ones((2, 3, 5), bool))
    # Masking out the last two keys must change the output...
    partial = mha(q, kv, mask=jnp.asarray(np.tile([True, True, True, False, False], (2, 3, 1))))
    assert not np.allclose(np.asarray(full), np.asarray(partial))
    # ...and equal attention over only the first three keys.
    same = mha(q, kv[:, :3], mask=jnp.ones((2, 3, 3), bool))
    np.testing.assert_allclose(np.asarray(partial), np.asarray(same), atol=1e-5)


def test_mha_qk_norm_finite_at_scale():
    from cusrl_tpu.nn.layer.mha import MultiheadAttention

    mha = MultiheadAttention.init(jax.random.key(0), 16, 2, qk_norm=True, compute_dtype=None)
    q = jax.random.normal(jax.random.key(1), (1, 4, 16)) * 1e3
    out = mha(q, q, mask=jnp.ones((1, 4, 4), bool))
    assert np.isfinite(np.asarray(out)).all()


# -- environment spec hooks ---------------------------------------------------


def test_environment_spec_override_hook():
    from cusrl_tpu.hook.mdp.environment_spec import EnvironmentSpecOverride
    from tests.helpers import create_dummy_env

    import cusrl_tpu

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1).to_underlying()
    factory.register_hook(
        EnvironmentSpecOverride.create(timestep=0.42), before="value_computation"
    )
    agent = factory(env.spec)
    assert agent.environment_spec.timestep == pytest.approx(0.42)


# -- CLI override parsing -----------------------------------------------------


def test_cli_override_splitting_and_application():
    from cusrl_tpu.utils.cli_utils import split_cli_overrides

    own, overrides = split_cli_overrides(
        ["train", "-env", "X", "--", "--agent.lr", "1e-4", "--agent.sampler_epochs", "3"]
    )
    assert own == ["train", "-env", "X"]
    assert overrides == ["--agent.lr", "1e-4", "--agent.sampler_epochs", "3"]


def test_cli_override_no_separator():
    from cusrl_tpu.utils.cli_utils import split_cli_overrides

    own, overrides = split_cli_overrides(["train", "-env", "X"])
    assert own == ["train", "-env", "X"] and overrides == []


# -- Linear precision semantics ----------------------------------------------


def test_linear_fp32_island_is_exact():
    from cusrl_tpu.nn.layer.linear import Linear

    lin = Linear.init(jax.random.key(0), 8, 4, compute_dtype=None)
    x = jax.random.normal(jax.random.key(1), (5, 8), jnp.float32)
    out = lin(x)
    assert out.dtype == jnp.float32
    expected = x @ lin.weight.T + lin.bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_linear_bf16_output_dtype_and_accuracy():
    from cusrl_tpu.nn.layer.linear import Linear

    lin = Linear.init(jax.random.key(0), 8, 4, compute_dtype="bfloat16")
    x = jax.random.normal(jax.random.key(1), (5, 8), jnp.float32)
    out = lin(x)
    assert out.dtype == jnp.bfloat16
    expected = x @ lin.weight.T + lin.bias
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(expected), rtol=5e-2, atol=5e-2)
