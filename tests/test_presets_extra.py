"""AMP/Distillation presets, random samplers, SaveTransition, spec overrides."""

import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.preset import AmpAgentFactory, DistillationAgentFactory
from tests.helpers import create_dummy_env, run_training


def test_amp_preset():
    env = create_dummy_env()
    dataset = np.random.default_rng(0).standard_normal((128, 4)).astype(np.float32)
    factory = AmpAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1,
        amp_dataset_source=dataset, amp_state_indices=(0, 1), amp_batch_size=16,
        amp_discriminator_hidden_dims=(16,),
    )
    agent = factory.to_underlying()(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["amp_discrimination_loss"])


def test_distillation_preset_learns_toward_expert():
    env = create_dummy_env()
    expert = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,)
    )(env.spec)
    factory = DistillationAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), sampler_mini_batches=2, lr=1e-3,
        expert=expert.state.actor,
    )
    agent = factory(env.spec)
    first = run_training(agent, env, num_updates=1)["distillation_loss"]
    assert first > 0
    for _ in range(10):
        last = run_training(agent, env, num_updates=1)["distillation_loss"]
    assert last < first  # behavior cloning reduces the expert-matching loss


def test_independent_agents_have_different_weights():
    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,))
    a1, a2 = factory(env.spec), factory(env.spec)
    w1 = np.asarray(a1.state.actor.backbone.layers[0].weight)
    w2 = np.asarray(a2.state.actor.backbone.layers[0].weight)
    assert not np.array_equal(w1, w2)


@pytest.mark.parametrize("sampler_name", ["random", "temporal_random"])
def test_random_samplers(sampler_name):
    from cusrl_tpu.sampler import RandomSampler, TemporalRandomSampler

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,)
    ).to_underlying()
    if sampler_name == "random":
        factory.sampler = RandomSampler(num_batches=3, batch_size=16)
    else:
        factory.sampler = TemporalRandomSampler(num_batches=3, batch_size=4, sequence_len=4)
    agent = factory(env.spec)
    metrics = run_training(agent, env, num_updates=2)
    assert np.isfinite(metrics["surrogate_loss"])


def test_save_transition_hook(tmp_path):
    from cusrl_tpu.hook import SaveTransition
    from cusrl_tpu.template.player import Player

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,))
    player = Player(
        environment=env, agent_factory=factory, num_steps=6, verbose=False,
        hooks=(SaveTransition(output_path=str(tmp_path / "data")),),
    )
    player.run_playing_loop()
    data = np.load(tmp_path / "data.npz")
    assert data["reward"].shape[0] == 6


def test_environment_spec_override():
    from cusrl_tpu.hook import EnvironmentSpecOverride

    env = create_dummy_env()
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, actor_hidden_dims=(16,), critic_hidden_dims=(16,)
    ).to_underlying()
    factory.register_hook(EnvironmentSpecOverride.create(timestep=0.05), index=0)
    agent = factory(env.spec)
    assert agent.environment_spec.timestep == 0.05
