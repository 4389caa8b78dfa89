"""The minibatch key-subset + fused tile-gather fast path must be numerically
invisible: an update through the recorded-subset gather produces bit-identical
parameters to the conservative full-field path (forced by disabling the
recorder so every rollout field is shuffled/gathered)."""

import jax
import numpy as np

import cusrl_tpu
from cusrl_tpu.template.actor_critic import ActorCritic, _KeyRecorder
from cusrl_tpu.template.rollout import ScanRolloutDriver
from cusrl_tpu.testing import DummyJaxEnvironment


def _run(force_full: bool, monkeypatch):
    from cusrl_tpu.utils import misc

    if force_full:
        monkeypatch.setattr(ActorCritic, "_record_batch_keys", lambda self, state, meta, flat: None)
    cusrl_tpu.set_global_seed(11)
    misc._KEY_COUNTER[0] = 0
    env = DummyJaxEnvironment(observation_dim=5, action_dim=3, num_instances=4)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
        sampler_epochs=2,
        sampler_mini_batches=2,
        normalize_observation=True,
        desired_kl_divergence=0.01,
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env, packed=False)
    for _ in range(2):
        driver.collect_and_update(8)
    return agent


def test_key_subset_update_matches_full_batch_path(monkeypatch):
    with monkeypatch.context() as m:
        agent_subset = _run(force_full=False, monkeypatch=m)
    with monkeypatch.context() as m:
        agent_full = _run(force_full=True, monkeypatch=m)
    for a, b in zip(jax.tree.leaves(agent_subset.state.actor), jax.tree.leaves(agent_full.state.actor)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(agent_subset.state.critic), jax.tree.leaves(agent_full.state.critic)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recorded_keys_cover_the_ppo_suite():
    """The recorder must find the fields PPO's objective fold reads and skip
    rollout-only fields (next_observation, reward, terminated, ...)."""
    recorded = {}
    orig = ActorCritic._record_batch_keys

    def spy(self, state, meta, flat):
        out = orig(self, state, meta, flat)
        recorded["keys"], recorded["flat"] = out, set(flat)
        return out

    ActorCritic._record_batch_keys = spy
    try:
        cusrl_tpu.set_global_seed(0)
        env = DummyJaxEnvironment(observation_dim=5, action_dim=3, num_instances=4)
        factory = cusrl_tpu.PpoAgentFactory(
            num_steps_per_update=8,
            actor_hidden_dims=(16,),
            critic_hidden_dims=(16,),
            sampler_epochs=1,
            sampler_mini_batches=2,
            normalize_observation=True,
        )
        agent = factory(env.spec)
        ScanRolloutDriver(agent, env, packed=False).collect_and_update(8)
    finally:
        ActorCritic._record_batch_keys = orig
    keys = recorded["keys"]
    assert keys is not None
    for required in ("observation", "action", "action_logp", "advantage", "return", "value"):
        assert required in keys
    kept = recorded["flat"] & keys
    for rollout_only in ("next_observation", "reward", "terminated", "truncated"):
        assert rollout_only not in kept


def test_recorder_fallback_on_enumeration():
    accessed, fallback = set(), [False]
    rec = _KeyRecorder({"a": 1, "b": 2}, accessed, fallback)
    _ = rec["a"]
    _ = rec.get("c")
    assert "x" not in rec
    copy = rec.copy()
    _ = copy["b"]
    assert accessed == {"a", "c", "x", "b"}
    assert not fallback[0]
    list(rec.items())
    assert fallback[0]
