"""Tests for the remaining NN components: normalization modules, separable conv,
gates, encodings, losses, Simba/Cnn/Stub backbones, recurrent utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_normalization_roundtrip():
    from cusrl_tpu.nn.module.normalization import Denormalization, Normalization

    scale, shift = jnp.asarray([2.0, 4.0]), jnp.asarray([1.0, -1.0])
    x = jax.random.normal(jax.random.key(0), (5, 2))
    norm, _, _ = Normalization.init(scale, shift)(x)
    denorm, _, _ = Denormalization.init(scale, shift)(norm)
    np.testing.assert_allclose(np.asarray(denorm), np.asarray(x), atol=1e-6)


def test_separable_conv_shapes():
    from cusrl_tpu.nn.layer.separable_conv import SeparableConv2d

    conv = SeparableConv2d.init(jax.random.key(0), 3, 8, 3)
    y = conv(jnp.zeros((2, 16, 16, 3)))
    assert y.shape == (2, 16, 16, 8)


def test_gates():
    from cusrl_tpu.nn.layer.gate import make_gate

    x = jax.random.normal(jax.random.key(0), (4, 8))
    y = jax.random.normal(jax.random.key(1), (4, 8))
    for kind in ("passthrough", "residual", "input", "output", "highway", "sigmoid_tanh", "gru"):
        gate = make_gate(kind, 8, jax.random.key(2))
        out = gate(x, y)
        assert out.shape == (4, 8) and np.isfinite(np.asarray(out)).all(), kind


def test_rope_relative_property():
    """RoPE: attention scores depend only on relative positions."""
    from cusrl_tpu.nn.layer.encoding import RotaryEmbedding

    rope = RotaryEmbedding(dim=8)
    q = jax.random.normal(jax.random.key(0), (1, 8))
    k = jax.random.normal(jax.random.key(1), (1, 8))
    s1 = jnp.sum(rope(q, jnp.asarray([5])) * rope(k, jnp.asarray([3])))
    s2 = jnp.sum(rope(q, jnp.asarray([12])) * rope(k, jnp.asarray([10])))
    assert float(jnp.abs(s1 - s2)) < 1e-4


def test_sinusoidal_encoding_and_alibi():
    from cusrl_tpu.nn.layer.encoding import SinusoidalPositionalEncoding, alibi_slopes

    enc = SinusoidalPositionalEncoding(dim=16)
    out = enc(jnp.arange(10))
    assert out.shape == (10, 16)
    slopes = alibi_slopes(6)
    assert slopes.shape == (6,) and bool(jnp.all(slopes > 0))


def test_losses():
    from cusrl_tpu.nn.layer.loss import L2RegularizationLoss, NormalNllLoss, gradient_penalty

    x = jax.random.normal(jax.random.key(0), (8, 4))
    w = jax.random.normal(jax.random.key(1), (4, 1))
    penalty = gradient_penalty(lambda inp: inp @ w, x)
    np.testing.assert_allclose(float(penalty), float(jnp.sum(jnp.square(w))), rtol=1e-5)

    nll = NormalNllLoss()(jnp.zeros((4, 1)), jnp.ones((4, 1)), jnp.zeros((4, 1)))
    assert float(nll) == pytest.approx(0.0, abs=1e-6)

    l2 = L2RegularizationLoss()( {"w": jnp.full((2,), 2.0)} )
    assert float(l2) == pytest.approx(4.0)


@pytest.mark.parametrize("factory_name", ["simba", "cnn", "stub"])
def test_alternative_backbones_in_ppo(factory_name):
    import cusrl_tpu
    from cusrl_tpu.nn.module.cnn import CnnFactory
    from cusrl_tpu.nn.module.simba import SimbaFactory
    from cusrl_tpu.nn.module.stub import StubModuleFactory
    from cusrl_tpu.nn.module.mlp import MlpFactory
    from cusrl_tpu.nn.module.actor import ActorFactory
    from cusrl_tpu.nn.module.critic import ValueFactory
    from cusrl_tpu.nn.module.distribution import NormalDistFactory
    from cusrl_tpu.preset.optimizer import AdamFactory
    from cusrl_tpu.preset.ppo import ppo_hook_suite
    from cusrl_tpu.sampler import AutoMiniBatchSampler
    from cusrl_tpu.template.actor_critic import ActorCriticFactory
    from tests.helpers import create_dummy_env, run_training

    if factory_name == "simba":
        backbone = SimbaFactory(hidden_dim=16, num_blocks=1)
        env = create_dummy_env()
    elif factory_name == "cnn":
        backbone = CnnFactory(input_shape=(8, 8, 1), channels=(4,), kernel_sizes=(3,), strides=(2,), hidden_dim=16)
        env = create_dummy_env(observation_dim=64)
    else:
        backbone = StubModuleFactory()
        env = create_dummy_env()

    critic_backbone = backbone if factory_name != "stub" else StubModuleFactory()
    actor_backbone = backbone if factory_name != "stub" else MlpFactory(hidden_dims=(16,), ends_with_activation=True)
    factory = ActorCriticFactory(
        num_steps_per_update=8,
        actor_factory=ActorFactory(backbone_factory=actor_backbone, distribution_factory=NormalDistFactory()),
        critic_factory=ValueFactory(backbone_factory=critic_backbone),
        optimizer_factory=AdamFactory(lr=1e-3),
        sampler=AutoMiniBatchSampler(num_epochs=1, num_mini_batches=1),
        hooks=ppo_hook_suite(),
    )
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=1)
    assert np.isfinite(metrics["surrogate_loss"])


def test_recurrent_utils():
    from cusrl_tpu.nn.utils.recurrent import (
        compute_cumulative_timesteps,
        compute_reverse_cumulative_timesteps,
        compute_sequence_lengths,
    )

    done = jnp.asarray([[[False]], [[True]], [[False]], [[False]]])
    steps = np.asarray(compute_cumulative_timesteps(done)).squeeze(-1)
    np.testing.assert_array_equal(steps, [0, 1, 0, 1])
    reverse = np.asarray(compute_reverse_cumulative_timesteps(done)).squeeze(-1)
    np.testing.assert_array_equal(reverse, [1, 0, 1, 0])
    lengths = np.asarray(compute_sequence_lengths(done)).squeeze(-1)
    np.testing.assert_array_equal(lengths, [2, 2, 2, 2])


def test_dataclass_utils():
    from cusrl_tpu.utils.dataclass_utils import to_dataclass, to_strict_typed_dataclass

    class Cfg:
        def __init__(self):
            self.lr = 1e-3
            self.dims = (64, 64)

    dc = to_dataclass(Cfg())
    assert dc.lr == 1e-3 and dc.dims == (64, 64)
    strict = to_strict_typed_dataclass(Cfg())
    assert type(strict).__dataclass_fields__["lr"].type is float
