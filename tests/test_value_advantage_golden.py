"""Golden math for value-loss clipping and advantage normalization/reduction
(counterpart of cusrl_test/hook/test_value_loss.py + test_advantage.py)."""

import types

import jax.numpy as jnp
import numpy as np

from cusrl_tpu.hook.on_policy.advantage import AdvantageNormalization, AdvantageReduction
from cusrl_tpu.hook.on_policy.value import ValueLoss


def test_value_loss_unclipped_golden():
    hook = ValueLoss(weight=0.5)
    B = 4
    batch = {
        "curr_value": jnp.asarray([[1.0], [2.0], [3.0], [4.0]]),
        "value": jnp.asarray([[1.0], [1.0], [1.0], [1.0]]),
        "return": jnp.asarray([[0.0], [2.0], [2.0], [6.0]]),
    }
    _, _, objectives, _ = hook.objective(types.SimpleNamespace(critic=None), {"temporal": False}, dict(batch))
    # mse = mean((v - R)^2) = mean(1, 0, 1, 4) = 1.5; x weight 0.5 = 0.75
    np.testing.assert_allclose(float(objectives["value_loss"]), 0.75, rtol=1e-6)


def test_value_loss_clipped_golden():
    hook = ValueLoss(weight=1.0, loss_clip=0.5)
    batch = {
        "curr_value": jnp.asarray([[3.0]]),   # moved +2 from old value 1.0
        "value": jnp.asarray([[1.0]]),
        "return": jnp.asarray([[0.0]]),
    }
    _, _, objectives, _ = hook.objective(types.SimpleNamespace(critic=None), {"temporal": False}, dict(batch))
    # clipped value = 1.0 + clip(3-1, ±0.5) = 1.5; loss = max((3-0)^2, (1.5-0)^2) = 9
    np.testing.assert_allclose(float(objectives["value_loss"]), 9.0, rtol=1e-6)


def test_advantage_normalization_standardizes():
    hook = AdvantageNormalization()
    adv = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    _, out, _ = hook.pre_update(None, {"advantage": adv})
    a = np.asarray(out["advantage"]).reshape(-1)
    np.testing.assert_allclose(a.mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(a.std(), 1.0, atol=1e-2)


def test_advantage_reduction_sums_reward_dims():
    hook = AdvantageReduction()
    adv = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])  # 2-dim reward advantage
    _, out, _, _ = hook.objective(None, {"temporal": False}, {"advantage": adv})
    np.testing.assert_allclose(np.asarray(out["advantage"]).reshape(-1), [3.0, 7.0])


def test_advantage_reduction_weighted():
    hook = AdvantageReduction(weight=(1.0, 0.5))
    adv = jnp.asarray([[2.0, 4.0]])
    _, out, _, _ = hook.objective(None, {"temporal": False}, {"advantage": adv})
    np.testing.assert_allclose(np.asarray(out["advantage"]).reshape(-1), [4.0])
