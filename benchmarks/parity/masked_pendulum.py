"""Velocity-masked Pendulum: the partially-observable task for recurrent /
transformer learning-parity runs (VERDICT r3 item 3).

Observation = (cos θ, sin θ) only — angular velocity is hidden, so a memoryless
policy cannot act optimally and the recurrent/attention memory must integrate
it.  Both implementations (torch reference and cusrl_tpu) wrap the SAME
gymnasium env through this module so the MDP is identical.
"""

from __future__ import annotations

import numpy as np

MASKED_DIM = 2  # keep obs[0:2] = cos/sin; drop obs[2] = angular velocity


def make_masked_pendulum(render_mode=None):
    import gymnasium as gym

    env = gym.make("Pendulum-v1", render_mode=render_mode)
    low, high = env.observation_space.low[:MASKED_DIM], env.observation_space.high[:MASKED_DIM]
    space = gym.spaces.Box(low=low, high=high, dtype=np.float32)
    return gym.wrappers.TransformObservation(env, lambda obs: obs[:MASKED_DIM].astype(np.float32), space)


def make_masked_pendulum_vec(num_envs: int = 4):
    import gymnasium as gym

    return gym.vector.SyncVectorEnv(
        [make_masked_pendulum for _ in range(num_envs)],
        autoreset_mode=gym.vector.AutoresetMode.DISABLED,
    )


# Shared hyperparameters (mirrors the reference's Pendulum-v1 zoo entry,
# cusrl/zoo/gym/classic_control.py:120-142, adapted for BPTT: shorter
# num_steps_per_update with temporal minibatches).
HPARAMS = dict(
    num_steps_per_update=256,
    lr=1e-3,
    sampler_epochs=5,
    sampler_mini_batches=4,
    normalize_observation=True,
    gae_gamma=0.9,
    entropy_loss_weight=0.0,
    max_grad_norm=0.5,
)
NUM_ENVS = 4
NUM_ITERATIONS = 250
RNN = dict(rnn_type="gru", hidden_size=64, mlp_hidden=(64,))
TRANSFORMER = dict(embed_dim=64, num_heads=4, window=16, mlp_hidden=(64,))
