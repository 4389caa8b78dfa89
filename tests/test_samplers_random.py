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


# ---------------------------------------------------------------------------
# Partially-filled / ring-buffer semantics (reference:
# cusrl/sampler/random_sampler.py:47-76).  The fill state arrives as TRACED
# scalars so the cursor never forces a recompile.
# ---------------------------------------------------------------------------


def _bstate(cursor, full):
    return {"cursor": jnp.asarray(cursor, jnp.int32), "full": jnp.asarray(full)}


def test_random_sampler_partial_buffer_draws_valid_region_only():
    rollout = make_rollout(T=6, N=4)
    s = RandomSampler(num_batches=8, batch_size=64)
    _, _, idx = s.make_plan(jax.random.key(5), 6, 4, rollout, buffer_state=_bstate(3, False))
    idx = np.asarray(idx)
    # Only rows [0, cursor*N) = [0, 12) of the flattened [T*N] layout are valid.
    assert (idx >= 0).all() and (idx < 12).all()
    # ...and the valid region is actually covered (uniform over 12 cells).
    assert len(np.unique(idx)) == 12

    # Full buffer: the whole flat range is fair game again.
    _, _, idx_full = s.make_plan(jax.random.key(5), 6, 4, rollout, buffer_state=_bstate(3, True))
    assert (np.asarray(idx_full) < 24).all() and (np.asarray(idx_full) >= 12).any()


def test_temporal_random_sampler_partial_buffer_windows():
    rollout = make_rollout(T=8, N=5)
    s = TemporalRandomSampler(num_batches=4, batch_size=16, sequence_len=3)
    _, _, (t, e) = s.make_plan(jax.random.key(6), 8, 5, rollout, buffer_state=_bstate(5, False))
    t = np.asarray(t)
    # Windows live entirely inside the 5 valid steps and stay contiguous.
    assert (t >= 0).all() and (t < 5).all()
    np.testing.assert_array_equal(np.diff(t, axis=1), np.ones_like(np.diff(t, axis=1)))


def test_temporal_random_sampler_ring_mapping_when_wrapped():
    """With a WRAPPED buffer (full=True, cursor=c), logical time starts at the
    oldest step c: windows are contiguous modulo capacity and may cross the
    wrap point, exactly the reference's (cursor + t) % capacity mapping."""
    capacity = 8
    rollout = make_rollout(T=capacity, N=5)
    s = TemporalRandomSampler(num_batches=4, batch_size=64, sequence_len=3)
    _, _, (t, e) = s.make_plan(jax.random.key(7), capacity, 5, rollout, buffer_state=_bstate(5, True))
    t = np.asarray(t)
    assert (t >= 0).all() and (t < capacity).all()
    # Contiguity modulo capacity.
    np.testing.assert_array_equal(np.diff(t, axis=1) % capacity, np.ones_like(np.diff(t, axis=1)))
    # Some window crosses the wrap boundary (cursor=5, seq=3 -> start 5 or 6 wraps).
    assert (np.diff(t, axis=1) < 0).any()


def test_random_sampler_traced_cursor_no_recompile():
    """The same jitted plan function must serve every cursor value."""
    import functools

    s = RandomSampler(num_batches=2, batch_size=32)
    traces = [0]

    @functools.partial(jax.jit, static_argnums=())
    def plan(key, bstate):
        traces[0] += 1
        return s.make_plan(key, 6, 4, {}, buffer_state=bstate)[2]

    for cursor in (1, 2, 5):
        idx = plan(jax.random.key(0), _bstate(cursor, False))
        assert (np.asarray(idx) < cursor * 4).all()
    assert traces[0] == 1


def test_update_threads_buffer_state_to_random_sampler(monkeypatch):
    """ActorCritic.update passes the buffer fill state through to a sampler
    that accepts it (host-loop / off-policy-style path)."""
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.sampler.random_sampler import RandomSampler as RS

    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=12, action_dim=3, seed=1)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=6,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
        sampler_epochs=1,
        sampler_mini_batches=1,
    ).to_underlying()
    factory.sampler = RS(num_batches=2, batch_size=16)
    agent = factory(env.spec)

    seen = {}
    original = RS.make_plan

    def spy(self, key, capacity, parallelism, rollout, buffer_state=None):
        seen["buffer_state"] = buffer_state
        return original(self, key, capacity, parallelism, rollout, buffer_state)

    monkeypatch.setattr(RS, "make_plan", spy)

    rng = np.random.default_rng(0)
    observation = rng.standard_normal((8, 12)).astype(np.float32)
    for _ in range(agent.num_steps_per_update):
        agent.act(observation)
        observation = rng.standard_normal((8, 12)).astype(np.float32)
        agent.step(
            observation,
            rng.standard_normal((8, 1)).astype(np.float32),
            np.zeros((8, 1), bool),
            np.zeros((8, 1), bool),
        )
    agent.update()
    assert seen["buffer_state"] is not None
