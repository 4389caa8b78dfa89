"""JAX-native velocity-command locomotion benchmark environment.

A fully-vectorized point-mass "locomotion" task standing in for the IsaacLab /
mjlab velocity suites (cusrl/zoo/isaaclab/locomotion.py) as the throughput
benchmark workload: each of N instances tracks a random planar velocity command
with a 12-D action mapped through a fixed actuation matrix, observes a 48-D
feature vector, terminates when it leaves the arena and truncates on a time
limit.  The whole step is a handful of fused element-wise ops + two small
matmuls — representative of a GPU-resident sim's per-step cost structure while
remaining dependency-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cusrl_tpu.template.environment import EnvironmentSpec, JaxEnvironment

__all__ = ["VelocityLocomotionEnv", "demonstration_dataset"]


class VelocityLocomotionEnv(JaxEnvironment):
    def __init__(
        self,
        num_instances: int = 4096,
        observation_dim: int = 48,
        action_dim: int = 12,
        episode_length: int = 1000,
        dt: float = 0.02,
        arena_half_size: float = 50.0,
        seed: int = 0,
    ):
        spec = EnvironmentSpec(
            observation_dim=observation_dim,
            action_dim=action_dim,
            num_instances=num_instances,
            reward_dim=1,
            timestep=dt,
        )
        super().__init__(spec)
        self.episode_length = episode_length
        self.dt = dt
        self.arena_half_size = arena_half_size
        base_key = jax.random.key(seed)
        k1, k2 = jax.random.split(base_key)
        # Fixed actuation and observation-feature projections (not trainable).
        self._actuation = jax.random.normal(k1, (2, action_dim)) / jnp.sqrt(action_dim)
        raw_dim = 8 + action_dim  # pos(2) vel(2) cmd(2) phase(2) last_action(A)
        self._obs_proj = jax.random.normal(k2, (raw_dim, observation_dim)) / jnp.sqrt(raw_dim)

    # -- functional API --------------------------------------------------------

    def _sample_command(self, key, n):
        return jax.random.uniform(key, (n, 2), jnp.float32, -1.0, 1.0)

    def init_fn(self, key):
        n = self.num_instances
        cmd_key, key = jax.random.split(key)
        return {
            "pos": jnp.zeros((n, 2), jnp.float32),
            "vel": jnp.zeros((n, 2), jnp.float32),
            "command": self._sample_command(cmd_key, n),
            "last_action": jnp.zeros((n, self.spec.action_dim), jnp.float32),
            "steps": jnp.zeros((n,), jnp.int32),
        }

    def observe_fn(self, env_state):
        phase = env_state["steps"].astype(jnp.float32) * (2.0 * jnp.pi / 50.0)
        raw = jnp.concatenate(
            [
                env_state["pos"] / self.arena_half_size,
                env_state["vel"],
                env_state["command"],
                jnp.stack([jnp.sin(phase), jnp.cos(phase)], axis=-1),
                env_state["last_action"],
            ],
            axis=-1,
        )
        observation = jnp.tanh(raw @ self._obs_proj)
        return observation, None

    def step_fn(self, env_state, action, key):
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        accel = action @ self._actuation.T
        vel = env_state["vel"] * 0.98 + self.dt * accel * 10.0
        pos = env_state["pos"] + self.dt * vel
        steps = env_state["steps"] + 1

        tracking_error = jnp.sum(jnp.square(vel - env_state["command"]), axis=-1)
        action_penalty = 0.01 * jnp.sum(jnp.square(action), axis=-1)
        reward = (jnp.exp(-tracking_error) - action_penalty)[:, None]

        out_of_bounds = jnp.max(jnp.abs(pos), axis=-1) > self.arena_half_size
        terminated = out_of_bounds[:, None]
        truncated = (steps >= self.episode_length)[:, None]
        done = (terminated | truncated).squeeze(-1)

        cmd_key, _ = jax.random.split(key)
        new_command = self._sample_command(cmd_key, self.num_instances)
        reset = done[:, None]
        new_state = {
            "pos": jnp.where(reset, 0.0, pos),
            "vel": jnp.where(reset, 0.0, vel),
            "command": jnp.where(reset, new_command, env_state["command"]),
            "last_action": jnp.where(reset, 0.0, action),
            "steps": jnp.where(done, 0, steps),
        }
        return new_state, reward, terminated, truncated, {}


def demonstration_dataset(
    num_transitions: int = 65536,
    state_indices: tuple[int, ...] = tuple(range(16)),
    num_instances: int = 256,
    seed: int = 1,
) -> jax.Array:
    """Expert (obs_t, obs_{t+1}) transition pairs for the AMP discriminator:
    a scripted velocity-tracking controller (least-squares inverse of the
    actuation matrix) rolled out on `VelocityLocomotionEnv` — the on-device
    stand-in for the reference's reference-motion datasets
    (cusrl/hook/auxiliary/amp.py:16-168, environment_spec.demonstration_sampler).
    """
    env = VelocityLocomotionEnv(num_instances=num_instances, seed=seed)
    steps = -(-num_transitions // num_instances)
    inverse_actuation = jnp.linalg.pinv(env._actuation.T)  # (2, A)
    idx = jnp.asarray(state_indices)

    def controller(env_state):
        desired_accel = (env_state["command"] - env_state["vel"]) * (5.0 / (env.dt * 10.0))
        return jnp.clip(desired_accel @ inverse_actuation, -1.0, 1.0)

    def body(carry, key):
        env_state = carry
        obs, _ = env.observe_fn(env_state)
        action = controller(env_state)
        next_state, _, _, _, _ = env.step_fn(env_state, action, key)
        next_obs, _ = env.observe_fn(next_state)
        pair = jnp.concatenate([obs[..., idx], next_obs[..., idx]], axis=-1)
        return next_state, pair

    key = jax.random.key(seed + 1)
    init_state = env.init_fn(key)
    _, pairs = jax.lax.scan(body, init_state, jax.random.split(key, steps))
    return pairs.reshape(-1, pairs.shape[-1])[:num_transitions]
