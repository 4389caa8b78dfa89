"""Round-3 test-breadth additions: CLI error paths (counterpart of the
reference's cusrl_test/cli arg-parsing tests) and MiniBatchWiseLRSchedule
behavior (cusrl/hook/on_policy/lr_schedule.py:246-296)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.hook.on_policy.lr_schedule import (
    AdaptiveLRSchedule,
    MiniBatchWiseLRSchedule,
    ThresholdLRSchedule,
)
from cusrl_tpu.template.rollout import ScanRolloutDriver


# ---------------------------------------------------------------------------
# CLI error paths
# ---------------------------------------------------------------------------


def test_cli_unknown_subcommand_exits():
    from cusrl_tpu.__main__ import main

    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_cli_unknown_experiment_raises(tmp_path):
    from cusrl_tpu.__main__ import main

    with pytest.raises((KeyError, ValueError, SystemExit)):
        main([
            "train", "-env", "NoSuchEnv-v99", "-alg", "ppo",
            "--num-iterations", "1", "--logger", "none",
            "--log-dir", str(tmp_path / "logs"),
        ])


def test_cli_bad_override_path_raises(tmp_path):
    from cusrl_tpu.__main__ import main

    with pytest.raises((AttributeError, KeyError, ValueError, SystemExit)):
        main([
            "train", "-env", "CartPole-v1", "-alg", "ppo",
            "--num-iterations", "1", "--logger", "none",
            "--log-dir", str(tmp_path / "logs"), "--quiet",
            "--", "--agent.no_such_field", "5",
        ])


def test_cli_find_trial_missing_dir_raises(tmp_path):
    from cusrl_tpu.__main__ import main

    with pytest.raises((FileNotFoundError, SystemExit, ValueError)):
        main(["find-trial", "--log-dir", str(tmp_path / "does_not_exist")])


def test_cli_list_experiments_prints_registry(capsys):
    from cusrl_tpu.__main__ import main

    main(["list-experiments"])
    out = capsys.readouterr().out
    assert "CartPole-v1" in out and "ppo" in out


# ---------------------------------------------------------------------------
# LR schedule math + MiniBatchWise behavior
# ---------------------------------------------------------------------------


def test_threshold_schedule_scale_directions():
    hook = ThresholdLRSchedule(desired_kl_divergence=0.01, threshold=2.0, scale_factor=1.5)
    _, up = hook._compute_scale(jnp.asarray(0.001))  # far below band
    _, mid = hook._compute_scale(jnp.asarray(0.01))  # inside band
    _, down = hook._compute_scale(jnp.asarray(0.2))  # above band
    assert float(up) == pytest.approx(1.5)
    assert float(mid) == pytest.approx(1.0)
    assert float(down) == pytest.approx(1.0 / 1.5)


def test_adaptive_schedule_accumulates_and_triggers():
    hook = AdaptiveLRSchedule(desired_kl_divergence=0.01, threshold=1.0, scale_factor=0.2)
    # One big-KL observation: log(0.1/0.01) = log 10 > 1 -> immediate trigger.
    new_hook, scale = hook._compute_scale(jnp.asarray(0.1))
    assert float(scale) < 1.0
    assert float(new_hook.accumulated_log_error) == 0.0  # reset on trigger
    # A tiny error accumulates without triggering.
    new_hook, scale = hook._compute_scale(jnp.asarray(0.0102))
    assert float(scale) == pytest.approx(1.0)
    assert float(new_hook.accumulated_log_error) != 0.0


def make_agent(**kwargs):
    cusrl_tpu.set_global_seed(0)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=16, observation_dim=12, action_dim=3, seed=1)
    defaults = dict(
        num_steps_per_update=8,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
        sampler_epochs=2,
        sampler_mini_batches=2,
    )
    defaults.update(kwargs)
    factory = cusrl_tpu.PpoAgentFactory(**defaults).to_underlying()
    return env, factory


def test_minibatchwise_schedule_scales_lr_during_update():
    env, factory = make_agent()
    factory.register_hook(
        MiniBatchWiseLRSchedule(desired_kl_divergence=0.01, threshold=2.0, scale_factor=1.5),
        after="on_policy_preparation",
    )
    agent = factory(env.spec)

    # post_init must have flipped calculate_kl_divergence on OnPolicyPreparation.
    prep = agent.get_hook("on_policy_preparation")
    assert prep.calculate_kl_divergence

    base_lr = float(agent.state.learning_rates["default"])
    driver = ScanRolloutDriver(agent, env)
    driver.collect_and_update(agent.num_steps_per_update)
    new_lr = float(agent.state.learning_rates["default"])
    # First update: policy barely moves -> KL far below the band -> LR scaled UP
    # once per minibatch (4 minibatches here).
    assert new_lr > base_lr
    assert new_lr == pytest.approx(base_lr * 1.5**4, rel=1e-3)


def test_minibatchwise_requires_kl_entry():
    hook = MiniBatchWiseLRSchedule(desired_kl_divergence=0.01)
    with pytest.raises(RuntimeError, match="kl_divergence"):
        hook.objective(None, {}, {})
