"""Golden-value tests for the algorithm math (GAE, PPO losses, advantage,
distributions, RMS) — the parity contract from BASELINE.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.hook.on_policy.gae import GeneralizedAdvantageEstimation, generalized_advantage_estimation
from cusrl_tpu.hook.on_policy.ppo import EntropyLoss, PpoSurrogateLoss, ppo_surrogate_loss
from cusrl_tpu.nn.layer.rms import RunningMeanStd
from tests.helpers import numpy_gae_reference


def test_gae_resets_at_done_boundaries():
    reward = jnp.asarray([[[1.0]], [[1.0]], [[1.0]]])
    done = jnp.asarray([[[False]], [[True]], [[False]]])
    value = jnp.zeros_like(reward)
    next_value = jnp.zeros_like(reward)
    advantage = generalized_advantage_estimation(reward, done, value, next_value, gamma=0.5, lamda=1.0)
    np.testing.assert_allclose(np.asarray(advantage), [[[1.5]], [[1.0]], [[1.0]]])


def test_gae_matches_numpy_reference_on_random_rollout():
    rng = np.random.default_rng(0)
    t, n, d = 32, 8, 2
    reward = rng.standard_normal((t, n, d)).astype(np.float32)
    done = rng.random((t, n, 1)) < 0.15
    value = rng.standard_normal((t, n, d)).astype(np.float32)
    next_value = rng.standard_normal((t, n, d)).astype(np.float32)
    ours = np.asarray(generalized_advantage_estimation(reward, done, value, next_value, 0.99, 0.95))
    ref = numpy_gae_reference(reward, done, value, next_value, 0.99, 0.95)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gae_hook_writes_advantage_and_separate_value_return():
    hook = GeneralizedAdvantageEstimation(gamma=0.5, lamda=1.0, lamda_value=0.0)
    rollout = {
        "reward": jnp.asarray([[[1.0]], [[2.0]]]),
        "done": jnp.zeros((2, 1, 1), bool),
        "value": jnp.asarray([[[0.5]], [[1.0]]]),
        "next_value": jnp.asarray([[[1.0]], [[0.0]]]),
    }
    _, rollout, _ = hook.pre_update(None, rollout)
    np.testing.assert_allclose(np.asarray(rollout["advantage"]), [[[1.5]], [[1.0]]])
    np.testing.assert_allclose(np.asarray(rollout["return"]), [[[1.5]], [[2.0]]])


@pytest.mark.parametrize(
    "kwargs",
    [{"gamma": -0.1}, {"gamma": 1.0}, {"lamda": -0.1}, {"lamda": 1.1}, {"lamda_value": 1.1}],
)
def test_gae_validates_parameters(kwargs):
    with pytest.raises(ValueError):
        GeneralizedAdvantageEstimation(**kwargs)


def test_ppo_surrogate_loss_golden_value():
    advantage = jnp.asarray([[1.0], [-2.0]])
    prob_ratio = jnp.asarray([[1.5], [0.5]])
    loss = ppo_surrogate_loss(advantage, prob_ratio, clip_ratio=0.2)
    assert float(loss) == pytest.approx(0.2)


def test_ppo_loss_validation():
    with pytest.raises(ValueError):
        PpoSurrogateLoss(clip_ratio=0.0)
    with pytest.raises(ValueError):
        PpoSurrogateLoss(weight=-1.0)
    with pytest.raises(ValueError):
        EntropyLoss(weight=-1.0)


def test_entropy_loss_value():
    hook = EntropyLoss(weight=0.5)
    _, _, obj, _ = hook.objective(None, {}, {"curr_entropy": jnp.asarray([[1.0], [3.0]])})
    assert float(obj["entropy_loss"]) == pytest.approx(-1.0)


def test_normal_distribution_math_matches_closed_form():
    from cusrl_tpu.nn.module.distribution import NormalDistFactory

    dist = NormalDistFactory(bijector=None)(4, 2, jax.random.key(0))
    params = {"mean": jnp.asarray([[0.5, -0.5]]), "std": jnp.asarray([[1.0, 2.0]])}
    sample = jnp.asarray([[1.0, 0.0]])
    logp = float(dist.compute_logp(params, sample).squeeze())
    expected = sum(
        -0.5 * ((x - m) / s) ** 2 - np.log(s) - 0.5 * np.log(2 * np.pi)
        for x, m, s in [(1.0, 0.5, 1.0), (0.0, -0.5, 2.0)]
    )
    assert logp == pytest.approx(expected, rel=1e-5)
    entropy = float(dist.compute_entropy(params).squeeze())
    expected_entropy = sum(0.5 * np.log(2 * np.pi * np.e * s**2) for s in [1.0, 2.0])
    assert entropy == pytest.approx(expected_entropy, rel=1e-5)
    kl_same = float(dist.compute_kl_div(params, params).squeeze())
    assert kl_same == pytest.approx(0.0, abs=1e-6)


def test_categorical_distribution_math():
    from cusrl_tpu.nn.module.distribution import OneHotCategoricalDistFactory

    dist = OneHotCategoricalDistFactory()(4, 3, jax.random.key(0))
    logits = jnp.asarray([[1.0, 0.0, -1.0]])
    params = {"logits": logits}
    probs = np.exp(np.asarray(logits[0]))
    probs /= probs.sum()
    sample = jnp.asarray([[1.0, 0.0, 0.0]])
    assert float(dist.compute_logp(params, sample).squeeze()) == pytest.approx(np.log(probs[0]), rel=1e-5)
    assert float(dist.compute_entropy(params).squeeze()) == pytest.approx(-(probs * np.log(probs)).sum(), rel=1e-5)
    action, logp = dist.sample(params, jax.random.key(1))
    assert action.shape == (1, 3) and float(action.sum()) == 1.0


def test_rms_matches_numpy_statistics():
    rng = np.random.default_rng(1)
    rms = RunningMeanStd.init(4, clamp=None)
    chunks = [rng.standard_normal((50, 4)).astype(np.float32) * (i + 1) + i for i in range(3)]
    for chunk in chunks:
        rms = rms.update(jnp.asarray(chunk))
    full = np.concatenate(chunks, axis=0)
    np.testing.assert_allclose(np.asarray(rms.mean), full.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rms.var), full.var(0), atol=1e-4)
    assert float(rms.count) == 150
    normalized = np.asarray(rms.normalize(jnp.asarray(full)))
    np.testing.assert_allclose(normalized.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(normalized.std(0), 1.0, atol=1e-3)


def test_rms_groups_and_excluded():
    rms = RunningMeanStd.init(4, groups=((0, 1),), excluded_indices=(3,), clamp=None)
    data = jnp.asarray(np.random.default_rng(2).standard_normal((100, 4)).astype(np.float32) * [1, 3, 5, 7])
    rms = rms.update(data)
    mean = np.asarray(rms.mean)
    assert mean[0] == pytest.approx(mean[1])  # grouped channels share stats
    assert mean[3] == 0.0 and float(rms.var[3]) == 1.0  # excluded untouched


def test_rms_masked_update():
    rng = np.random.default_rng(3)
    data = rng.standard_normal((10, 4)).astype(np.float32)
    mask = np.zeros(10, bool)
    mask[:4] = True
    rms = RunningMeanStd.init(4, clamp=None).update(jnp.asarray(data), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(rms.mean), data[:4].mean(0), atol=1e-5)
    assert float(rms.count) == 4
