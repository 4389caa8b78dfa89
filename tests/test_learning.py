"""End-to-end learning validation on the scan path: PPO must improve velocity
tracking on the JAX-native locomotion env within a small budget (the CPU-fast
analogue of the reference's MountainCar quick-start check)."""

import numpy as np

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.template.trainer import Trainer


def test_ppo_learns_velocity_tracking():
    env = VelocityLocomotionEnv(num_instances=128, episode_length=200)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=24,
        actor_hidden_dims=(64, 64),
        critic_hidden_dims=(64, 64),
        activation_fn="elu",
        lr=1e-3,
        sampler_epochs=4,
        sampler_mini_batches=4,
        normalize_observation=True,
        desired_kl_divergence=0.015,
        entropy_loss_weight=0.002,
    )
    trainer = Trainer(environment=env, agent_factory=factory, num_iterations=40, verbose=False)

    rewards = []
    original = trainer._log_iteration

    def spy(iteration, metrics):
        info = original(iteration, metrics)
        if (value := info.get("Environment/episode_reward")) is not None:
            rewards.append(value)
        return info

    trainer._log_iteration = spy
    trainer.run_training_loop()

    assert len(rewards) >= 10
    early = np.mean(rewards[:5])
    late = np.mean(rewards[-5:])
    # Pinned scale: reward is exp(-tracking_error) - action_penalty per step
    # over 200-step episodes, so a tracking policy scores ~150 and the initial
    # policy ~95 (measured trajectory: 95 -> 138 -> 150 within 40 iterations).
    # Require real progress AND a near-converged absolute level.
    assert late > early + 30, f"no learning progress: early={early:.1f} late={late:.1f}"
    assert late > 140, f"did not reach tracking-quality reward: late={late:.1f}"
