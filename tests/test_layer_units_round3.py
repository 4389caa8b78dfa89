"""Round-3 unit coverage for nn-layer pieces exercised only indirectly before:
bijectors (string specs, inverse round trips, clamping —
cusrl/nn/layer/bijector.py:19-150), gradient penalty (second-order autodiff,
loss.py:10-60), DetachGradient / ParameterWrapper, and ModuleInitialization
(orthogonal init + distribution-head gain, initialization.py:12-125)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.layer.bijector import (
    ExponentialBijector,
    IdentityBijector,
    SigmoidBijector,
    SoftplusBijector,
    make_bijector,
)


def test_make_bijector_specs():
    assert isinstance(make_bijector(None), IdentityBijector)
    assert isinstance(make_bijector("identity"), IdentityBijector)
    exp = make_bijector("exp_0.01_1.0")
    assert isinstance(exp, ExponentialBijector)
    assert (exp.min_value, exp.max_value) == (0.01, 1.0)
    sig = make_bijector("sigmoid_0.0_2.0")
    assert isinstance(sig, SigmoidBijector) and sig.max_value == 2.0
    assert isinstance(make_bijector("softplus"), SoftplusBijector)
    # A bijector instance passes through untouched.
    assert make_bijector(exp) is exp
    with pytest.raises(ValueError, match="Unsupported"):
        make_bijector("tanhspec")


@pytest.mark.parametrize(
    "bijector",
    [
        ExponentialBijector(0.01, 1.0),
        SigmoidBijector(0.0, 1.0),
        SoftplusBijector(1.0, 0.01, 1.0),
    ],
)
def test_bijector_inverse_round_trip(bijector):
    # Values strictly inside the output range round-trip through the inverse.
    ys = jnp.asarray([0.05, 0.2, 0.5, 0.9], jnp.float32)
    roundtrip = bijector(bijector.inverse(ys))
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(ys), rtol=1e-4, atol=1e-5)
    # Scalar (python float) path agrees with the array path.
    for y in (0.05, 0.5):
        assert bijector.inverse(y) == pytest.approx(float(bijector.inverse(jnp.asarray(y))), rel=1e-5)


def test_bijector_output_clamped():
    exp = ExponentialBijector(0.01, 1.0)
    out = np.asarray(exp(jnp.asarray([-100.0, 100.0])))
    np.testing.assert_allclose(out, [0.01, 1.0], rtol=1e-5)
    sig = SigmoidBijector(0.0, 1.0)
    assert 0.0 <= float(sig(jnp.asarray(-50.0))) < 1e-6
    soft = SoftplusBijector(1.0, 0.01, 1.0)
    out = np.asarray(soft(jnp.asarray([-100.0, 100.0])))
    np.testing.assert_allclose(out, [0.01, 1.0], rtol=1e-4)


def test_gradient_penalty_quadratic():
    """For fn(x) = sum(x^2), grad = 2x, penalty = E[||2x||^2] = 4 E[||x||^2]."""
    from cusrl_tpu.nn.layer.loss import GradientPenaltyLoss, gradient_penalty

    x = jnp.asarray([[1.0, 2.0], [3.0, 0.0]], jnp.float32)
    fn = lambda v: jnp.sum(jnp.square(v), axis=-1)
    expected = np.mean([4 * (1 + 4), 4 * 9])
    assert float(gradient_penalty(fn, x)) == pytest.approx(expected)
    per_sample = GradientPenaltyLoss(reduce_mean=False)(fn, x)
    np.testing.assert_allclose(np.asarray(per_sample), [20.0, 36.0], rtol=1e-6)


def test_normal_nll_loss_math():
    from cusrl_tpu.nn.layer.loss import NormalNllLoss

    mean = jnp.zeros((4, 2))
    var = jnp.ones((4, 2))
    target = jnp.ones((4, 2))
    # 0.5*(log 1 + 1) = 0.5; full adds 0.5*log(2*pi).
    assert float(NormalNllLoss()(mean, var, target)) == pytest.approx(0.5)
    assert float(NormalNllLoss(full=True)(mean, var, target)) == pytest.approx(
        0.5 + 0.5 * math.log(2 * math.pi)
    )


def test_detach_gradient_and_parameter_wrapper():
    from cusrl_tpu.nn.layer.activation import DetachGradient, ParameterWrapper

    detach = DetachGradient()
    grad = jax.grad(lambda x: jnp.sum(detach(x) * x))(jnp.ones(3))
    # d/dx [stop_grad(x) * x] = stop_grad(x) = 1 (the detached factor carries none).
    np.testing.assert_allclose(np.asarray(grad), np.ones(3))

    wrapper = ParameterWrapper(value=jnp.arange(4.0))
    np.testing.assert_array_equal(np.asarray(wrapper()), np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(wrapper("ignored", 123)), np.arange(4.0))
    # The wrapped value is a trainable pytree leaf.
    g = jax.grad(lambda w: jnp.sum(w() * 2.0))(wrapper)
    np.testing.assert_allclose(np.asarray(g.value), np.full(4, 2.0))


def test_module_initialization_orthogonal_and_head_gain():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv

    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=16, action_dim=4, seed=1)
    agent = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=4, actor_hidden_dims=(32, 32), critic_hidden_dims=(32, 32)
    )(env.spec)

    # Hidden layers: orthogonal with gain sqrt(2) -> W W^T = 2 I (rows <= cols).
    w = np.asarray(agent.state.actor.backbone.layers[1].weight)
    np.testing.assert_allclose(w @ w.T, 2.0 * np.eye(w.shape[0]), atol=1e-4)
    assert not np.asarray(agent.state.actor.backbone.layers[1].bias).any()
    # Distribution mean head uses the SMALL gain (sqrt(2)*0.1): singular values
    # all equal that gain.
    head = np.asarray(agent.state.actor.distribution.mean_head.weight)
    sv = np.linalg.svd(head, compute_uv=False)
    np.testing.assert_allclose(sv, np.full(len(sv), math.sqrt(2) * 0.1), atol=1e-4)


def test_device_memory_stats_hook_records():
    from cusrl_tpu.hook.control.memory import DeviceMemoryStats

    class FakeAgent:
        def __init__(self):
            self.recorded = {}

        def record(self, **kw):
            self.recorded.update(kw)

    hook = DeviceMemoryStats()
    agent = FakeAgent()
    out = hook.apply_schedule(3, agent)
    assert out is hook or out is not None  # never crashes without CUDA-style stats
