"""AMP learning parity on Pendulum-v1 with a synthetic demonstration dataset
(VERDICT r4 item 8): torch reference AmpAgentFactory (cusrl/preset/amp.py:13-53)
vs cusrl_tpu's, identical hyperparameters, shared expert data.

The "expert" transitions are upright-pendulum states (theta ~ N(0, 0.05),
theta_dot ~ N(0, 0.05)) encoded exactly as both AMP hooks build agent
transitions: concat(obs[state_indices], next_obs[state_indices]).  The style
reward therefore rewards staying upright — aligned with the task reward, so
both implementations should show comparable learning curves while exercising
the discriminator, gradient penalty, transition RMS, and reward injection.

Usage: python run_amp_parity.py <ref|ours> <seed> <out.jsonl>
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

import numpy as np

HPARAMS = dict(
    actor_hidden_dims=(64, 64),
    critic_hidden_dims=(64, 64),
    sampler_epochs=10,
    sampler_mini_batches=64,
    num_steps_per_update=1024,
    normalize_observation=True,
    gae_gamma=0.9,
    lr=1e-3,
    entropy_loss_weight=0.0,
    max_grad_norm=0.5,
    # AMP additions (both factories expose the same knobs).
    extrinsic_reward_scale=1.0,
    amp_discriminator_hidden_dims=(64, 64),
    amp_state_indices=(0, 1, 2),
    amp_batch_size=512,
    amp_reward_scale=1.0,
    amp_loss_weight=1.0,
    amp_grad_penalty_weight=5.0,
)
NUM_ENVS = 4
NUM_ITERATIONS = int(os.environ.get("AMP_ITERS", 50))


def expert_dataset(n: int = 4096, seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    theta = rng.normal(0.0, 0.05, size=(2, n))
    vel = rng.normal(0.0, 0.05, size=(2, n))
    obs = np.stack([np.cos(theta[0]), np.sin(theta[0]), vel[0]], axis=-1)
    nxt = np.stack([np.cos(theta[1]), np.sin(theta[1]), vel[1]], axis=-1)
    return np.concatenate([obs, nxt], axis=-1).astype(np.float32)


def run_reference(seed: int, out_path: str) -> None:
    sys.path.insert(0, os.path.join(HERE, "ref_stubs"))
    sys.path.insert(0, "/root/reference")
    import cusrl
    from cusrl.environment import make_gym_vec
    from cusrl.preset.amp import AmpAgentFactory
    from cusrl.template import Trainer
    from cusrl.template.logger import Logger

    class CaptureLogger(Logger):
        def __init__(self, out_path, **kwargs):
            super().__init__(**kwargs)
            self._fh = open(out_path, "w")

        def _log_impl(self, data, iteration):
            self._fh.write(
                json.dumps({"iteration": int(iteration), **{k: float(v) for k, v in data.items()}}) + "\n"
            )
            self._fh.flush()

    cusrl.set_global_seed(seed)
    hp = dict(HPARAMS)
    hp["activation_fn"] = "Tanh"
    factory = AmpAgentFactory(amp_dataset_source=expert_dataset(), **hp)
    trainer = Trainer(
        environment=lambda: make_gym_vec("Pendulum-v1", num_envs=NUM_ENVS),
        agent_factory=factory,
        logger_factory=lambda: CaptureLogger(
            out_path, log_dir=f"/tmp/parity_amp_ref_logs/{seed}", name=""
        ),
        num_iterations=NUM_ITERATIONS,
        checkpoint_interval=10**9,
    )
    trainer.run_training_loop()
    print(f"reference AMP run complete: seed={seed} -> {out_path}")


def run_ours(seed: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cusrl_tpu
    from cusrl_tpu.environment.gym import make_gym_vec
    from cusrl_tpu.preset.amp import AmpAgentFactory
    from cusrl_tpu.template.logger import Logger
    from cusrl_tpu.template.trainer import Trainer
    from cusrl_tpu.utils.misc import set_global_seed

    class CaptureLogger(Logger):
        def __init__(self, out_path, **kwargs):
            super().__init__(**kwargs)
            self._fh = open(out_path, "w")

        def _log_impl(self, data, iteration):
            self._fh.write(
                json.dumps({"iteration": int(iteration), **{k: float(v) for k, v in data.items()}}) + "\n"
            )
            self._fh.flush()

    set_global_seed(seed)
    hp = dict(HPARAMS)
    hp["activation_fn"] = "tanh"
    factory = AmpAgentFactory(amp_dataset_source=expert_dataset(), **hp)
    trainer = Trainer(
        environment=lambda: make_gym_vec(id="Pendulum-v1", num_envs=NUM_ENVS),
        agent_factory=factory,
        logger_factory=lambda name=None: CaptureLogger(
            out_path, log_dir=f"/tmp/parity_amp_ours_logs/{seed}", name=""
        ),
        num_iterations=NUM_ITERATIONS,
        checkpoint_interval=10**9,
        verbose=False,
    )
    trainer.run_training_loop()
    print(f"cusrl_tpu AMP run complete: seed={seed} -> {out_path}")


if __name__ == "__main__":
    impl, seed, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    if impl == "ref":
        run_reference(seed, out)
    else:
        run_ours(seed, out)
