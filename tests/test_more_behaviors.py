"""Behavioral tests: update rejection, inference-mode hook skipping, Trial
selection, distributed no-op helpers, player hooks."""

import numpy as np
import pytest

import cusrl_tpu
from tests.helpers import create_dummy_env, run_training


def test_update_rejection_restores_parameters():
    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=2, sampler_mini_batches=2,
        desired_kl_divergence=0.01, max_kl_divergence=1e-12,  # reject everything
    )
    agent = factory(env.spec)
    w_before = np.asarray(agent.state.actor.backbone.layers[0].weight)
    metrics = run_training(agent, env, num_updates=1)
    w_after = np.asarray(agent.state.actor.backbone.layers[0].weight)
    assert metrics["update_rejected"] == pytest.approx(1.0)
    np.testing.assert_array_equal(w_before, w_after)


def test_update_rejection_restores_hook_statefuls():
    """A rejected update must roll back hook-internal state mutated during the
    update phase (deferred RMS folds), mirroring the reference's full
    load_state_dict restore (cusrl/hook/on_policy/lr_schedule.py:69-80)."""
    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=2, sampler_mini_batches=2, normalize_observation=True,
        defer_normalization_updates=True,  # RMS folds inside the update phase
        desired_kl_divergence=0.01, max_kl_divergence=1e-12,  # reject everything
    )
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)  # first update seeds the RMS
    rms_before = agent.hook["observation_normalization"].observation_rms
    stats_before = (np.asarray(rms_before.mean), np.asarray(rms_before.count))
    metrics = run_training(agent, env, num_updates=1)
    assert metrics["update_rejected"] == pytest.approx(1.0)
    rms_after = agent.hook["observation_normalization"].observation_rms
    np.testing.assert_array_equal(stats_before[0], np.asarray(rms_after.mean))
    np.testing.assert_array_equal(stats_before[1], np.asarray(rms_after.count))


def test_update_acceptance_keeps_parameters():
    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=2, sampler_mini_batches=2,
        desired_kl_divergence=0.01, max_kl_divergence=100.0,  # accept everything
    )
    agent = factory(env.spec)
    w_before = np.asarray(agent.state.actor.backbone.layers[0].weight)
    metrics = run_training(agent, env, num_updates=1)
    w_after = np.asarray(agent.state.actor.backbone.layers[0].weight)
    assert metrics["update_rejected"] == pytest.approx(0.0)
    assert not np.array_equal(w_before, w_after)


def test_inference_mode_skips_training_only_hooks_but_normalizes():
    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        normalize_observation=True,
    )
    agent = factory(env.spec)
    run_training(agent, env, num_updates=1)
    count_before = float(agent.hook["observation_normalization"].observation_rms.count)
    agent.set_inference_mode(deterministic=True)
    obs, _, _ = env.reset()
    for _ in range(3):
        action = agent.act(obs)
        obs, _, reward, term, trunc, _ = env.step(action)
        agent.step(obs, reward, term, trunc)
    # Statistics frozen in inference; normalization still applied (finite action).
    assert float(agent.hook["observation_normalization"].observation_rms.count) == count_before
    assert np.isfinite(action).all()


def test_trial_iteration_selection(tmp_path):
    from cusrl_tpu.template.logger import Logger, save_checkpoint_file
    from cusrl_tpu.template.trial import Trial

    run_dir = tmp_path / "2026-01-01_exp"
    (run_dir / "ckpt").mkdir(parents=True)
    (run_dir / "info").mkdir()
    for iteration in (10, 20):
        save_checkpoint_file(str(run_dir / "ckpt" / f"ckpt_{iteration}.npz"), {"iteration": iteration})
    (tmp_path / "latest").symlink_to("2026-01-01_exp")

    latest = Trial(str(tmp_path))
    assert latest.iteration == 20
    specific = Trial(str(tmp_path), checkpoint=10)
    assert specific.iteration == 10
    direct = Trial(str(tmp_path), checkpoint=str(run_dir / "ckpt" / "ckpt_10.npz"))
    assert direct.load_checkpoint()["iteration"] == 10
    with pytest.raises(FileNotFoundError):
        Trial(str(tmp_path), checkpoint=15)


def test_distributed_helpers_single_process():
    from cusrl_tpu.utils import distributed

    assert not distributed.enabled()
    assert distributed.rank() == 0 and distributed.world_size() == 1
    assert distributed.is_main_process()
    distributed.barrier()
    assert distributed.gather_obj({"a": 1}) == [{"a": 1}]
    assert distributed.broadcast_obj(42) == 42
    assert distributed.average_dict({"x": 2.0}) == {"x": 2.0}


def test_player_hooks_receive_callbacks():
    from cusrl_tpu.template.player import Player, PlayerHook

    calls = {"init": 0, "step": 0, "reset": 0, "close": 0}

    class Probe(PlayerHook):
        def init(self, player):
            calls["init"] += 1

        def step(self, player, transition):
            calls["step"] += 1
            assert "reward" in transition

        def reset(self, player, indices):
            calls["reset"] += 1

        def close(self, player):
            calls["close"] += 1

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,))
    player = Player(environment=env, agent_factory=factory, num_steps=10, verbose=False, hooks=(Probe(),))
    player.run_playing_loop()
    assert calls["init"] == 1 and calls["close"] == 1
    assert calls["step"] == 10
    assert calls["reset"] >= 1  # ~10% done probability over 10x4 transitions


def test_rate_pacing():
    import time

    from cusrl_tpu.utils.timing import Rate

    rate = Rate(100.0)
    rate.reset()
    start = time.perf_counter()
    for _ in range(5):
        rate.tick()
    elapsed = time.perf_counter() - start
    assert elapsed >= 0.03  # at least ~4 periods of 10ms
