"""Numerical parity against torch reference math on fixed rollouts — the
BASELINE.md correctness contract: GAE, Normal logp/entropy/KL, PPO losses are
computed independently with torch (CPU) and must agree to float32 precision."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_normal_distribution_parity_with_torch():
    from cusrl_tpu.nn.module.distribution import NormalDistFactory

    rng = np.random.default_rng(0)
    mean = rng.standard_normal((16, 4)).astype(np.float32)
    std = (rng.random((16, 4)).astype(np.float32) + 0.1)
    sample = rng.standard_normal((16, 4)).astype(np.float32)

    dist = NormalDistFactory(bijector=None)(8, 4, jax.random.key(0))
    params = {"mean": jnp.asarray(mean), "std": jnp.asarray(std)}
    ours_logp = np.asarray(dist.compute_logp(params, jnp.asarray(sample)))
    ours_entropy = np.asarray(dist.compute_entropy(params))

    tdist = torch.distributions.Normal(torch.from_numpy(mean), torch.from_numpy(std))
    torch_logp = tdist.log_prob(torch.from_numpy(sample)).sum(-1, keepdim=True).numpy()
    torch_entropy = tdist.entropy().sum(-1, keepdim=True).numpy()
    np.testing.assert_allclose(ours_logp, torch_logp, atol=1e-5)
    np.testing.assert_allclose(ours_entropy, torch_entropy, atol=1e-5)

    mean2 = rng.standard_normal((16, 4)).astype(np.float32)
    std2 = (rng.random((16, 4)).astype(np.float32) + 0.1)
    params2 = {"mean": jnp.asarray(mean2), "std": jnp.asarray(std2)}
    ours_kl = np.asarray(dist.compute_kl_div(params, params2))
    torch_kl = (
        torch.distributions.kl_divergence(
            tdist, torch.distributions.Normal(torch.from_numpy(mean2), torch.from_numpy(std2))
        )
        .sum(-1, keepdim=True)
        .numpy()
    )
    np.testing.assert_allclose(ours_kl, torch_kl, atol=1e-5)


def test_categorical_distribution_parity_with_torch():
    from cusrl_tpu.nn.module.distribution import OneHotCategoricalDistFactory

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((8, 5)).astype(np.float32)
    index = rng.integers(0, 5, size=8)
    onehot = np.eye(5, dtype=np.float32)[index]

    dist = OneHotCategoricalDistFactory()(4, 5, jax.random.key(0))
    params = {"logits": jnp.asarray(logits)}
    ours_logp = np.asarray(dist.compute_logp(params, jnp.asarray(onehot)))[:, 0]
    ours_entropy = np.asarray(dist.compute_entropy(params))[:, 0]

    tdist = torch.distributions.OneHotCategorical(logits=torch.from_numpy(logits))
    torch_logp = tdist.log_prob(torch.from_numpy(onehot)).numpy()
    torch_entropy = tdist.entropy().numpy()
    np.testing.assert_allclose(ours_logp, torch_logp, atol=1e-5)
    np.testing.assert_allclose(ours_entropy, torch_entropy, atol=1e-5)


def test_gae_parity_with_torch_loop():
    from cusrl_tpu.hook.on_policy.gae import generalized_advantage_estimation

    rng = np.random.default_rng(2)
    t, n, d = 24, 8, 1
    reward = rng.standard_normal((t, n, d)).astype(np.float32)
    done = rng.random((t, n, 1)) < 0.12
    value = rng.standard_normal((t, n, d)).astype(np.float32)
    next_value = rng.standard_normal((t, n, d)).astype(np.float32)
    gamma, lamda = 0.99, 0.95

    # Torch reference recurrence (reference gae.py:8-20 formulation).
    reward_t = torch.from_numpy(reward)
    not_done_t = torch.from_numpy(~done)
    value_t = torch.from_numpy(value)
    next_value_t = torch.from_numpy(next_value)
    advantage_t = reward_t + next_value_t * gamma - value_t
    for step in range(t - 2, -1, -1):
        advantage_t[step] += not_done_t[step] * (gamma * lamda) * advantage_t[step + 1]

    ours = np.asarray(generalized_advantage_estimation(reward, done, value, next_value, gamma, lamda))
    np.testing.assert_allclose(ours, advantage_t.numpy(), atol=1e-5)


def test_ppo_losses_parity_with_torch():
    from cusrl_tpu.hook.on_policy.ppo import ppo_surrogate_loss
    from cusrl_tpu.hook.on_policy.value import _clipped_value_loss

    rng = np.random.default_rng(3)
    advantage = rng.standard_normal((64, 1)).astype(np.float32)
    ratio = np.exp(rng.standard_normal((64, 1)).astype(np.float32) * 0.2)
    clip = 0.2

    adv_t = torch.from_numpy(advantage)
    ratio_t = torch.from_numpy(ratio)
    torch_loss = -torch.min(adv_t * ratio_t, adv_t * ratio_t.clamp(1 - clip, 1 + clip)).mean()
    ours = float(ppo_surrogate_loss(jnp.asarray(advantage), jnp.asarray(ratio), clip))
    assert ours == pytest.approx(float(torch_loss), abs=1e-6)

    value = rng.standard_normal((64, 1)).astype(np.float32)
    curr = value + rng.standard_normal((64, 1)).astype(np.float32) * 0.5
    ret = rng.standard_normal((64, 1)).astype(np.float32)
    value_t, curr_t, ret_t = map(torch.from_numpy, (value, curr, ret))
    clipped_t = value_t + (curr_t - value_t).clamp(-clip, clip)
    torch_vloss = torch.max((curr_t - ret_t).square(), (clipped_t - ret_t).square()).mean()
    ours_vloss = float(_clipped_value_loss(jnp.asarray(value), jnp.asarray(curr), jnp.asarray(ret), clip))
    assert ours_vloss == pytest.approx(float(torch_vloss), abs=1e-6)
