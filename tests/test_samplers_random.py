"""Dedicated random-sampler tests (counterpart of
cusrl_test/sampler/test_random_sampler.py): plan shapes, gather correctness
against manual indexing, temporal window contiguity, auto dispatch."""

import jax
import jax.numpy as jnp
import numpy as np

from cusrl_tpu.sampler.random_sampler import AutoRandomSampler, RandomSampler, TemporalRandomSampler


def make_rollout(T=6, N=4, F=3):
    base = jnp.arange(T * N, dtype=jnp.float32).reshape(T, N)
    return {"observation": base[..., None] * jnp.ones((1, 1, F)), "reward": base[..., None]}


def test_random_sampler_plan_and_gather():
    rollout = make_rollout()
    s = RandomSampler(num_batches=3, batch_size=8)
    meta, meta_arrays, indices = s.make_plan(jax.random.key(0), 6, 4, rollout)
    assert meta == {"total_batches": 3, "temporal": False}
    assert indices.shape == (3, 8)
    assert (np.asarray(indices) >= 0).all() and (np.asarray(indices) < 24).all()

    batch = s.gather(rollout, indices[0])
    flat = np.asarray(rollout["observation"]).reshape(24, 3)
    np.testing.assert_array_equal(np.asarray(batch["observation"]), flat[np.asarray(indices[0])])


def test_temporal_random_sampler_windows_are_contiguous():
    rollout = make_rollout(T=8, N=5)
    s = TemporalRandomSampler(num_batches=2, batch_size=3, sequence_len=4)
    meta, _, (time_indices, env_indices) = s.make_plan(jax.random.key(1), 8, 5, rollout)
    assert meta["temporal"] is True
    assert time_indices.shape == (2, 4, 3) and env_indices.shape == (2, 3)
    t = np.asarray(time_indices)
    # Each window advances by exactly one step and stays in range.
    np.testing.assert_array_equal(np.diff(t, axis=1), np.ones((2, 3, 3), t.dtype))
    assert (t >= 0).all() and (t < 8).all()

    batch = s.gather(rollout, (time_indices[0], env_indices[0]))
    expected = np.asarray(rollout["reward"])[np.asarray(time_indices[0]), np.asarray(env_indices[0])[None, :]]
    np.testing.assert_array_equal(np.asarray(batch["reward"]), expected)


def test_auto_random_sampler_dispatch():
    s = AutoRandomSampler(num_batches=2, batch_size=4, sequence_len=3)
    plain = make_rollout()
    s.make_plan(jax.random.key(2), 6, 4, plain)
    assert isinstance(s._resolved, RandomSampler)

    recurrent = dict(plain)
    recurrent["actor_memory"] = jnp.zeros((6, 4, 2))
    s.make_plan(jax.random.key(2), 6, 4, recurrent)
    assert isinstance(s._resolved, TemporalRandomSampler)


def test_random_sampler_streams_differ_between_batches():
    s = RandomSampler(num_batches=4, batch_size=64)
    _, _, idx = s.make_plan(jax.random.key(3), 16, 16, {})
    rows = {tuple(np.asarray(r).tolist()) for r in idx}
    assert len(rows) == 4  # no duplicated batch index rows
