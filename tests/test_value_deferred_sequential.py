"""Deferred-sequential ValueComputation: the recurrent critic runs ZERO passes
inside the rollout scan — values come from one sequence-mode pass in pre_update
and bootstrap values from the counterfactual-append (eval_next_token) pass.
Both must be EXACT against the per-step path (the stepwise/sequence consistency
invariant extended to next-token queries)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.hook.on_policy.value import ValueComputation
from cusrl_tpu.nn.base import reset_memory
from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory
from cusrl_tpu.testing import DummyJaxEnvironment
from cusrl_tpu.utils import misc


@pytest.mark.parametrize("norm_mode", ["pre", "post", "none"])
@pytest.mark.parametrize("use_rope,use_alibi", [(True, False), (False, True)])
def test_eval_next_token_matches_stepwise(norm_mode, use_rope, use_alibi):
    """eval_next_token(y, ctx)[t] == stepping the layer on y[t] from the
    post-x[t] (pre-reset) ring state, for every t — including windows that
    cross done resets and windows reaching into the pre-sequence cache."""
    layer = CausalTransformerEncoderLayerFactory(
        embed_dim=16, num_heads=2, window=4, norm_mode=norm_mode,
        use_rope=use_rope, use_alibi=use_alibi, compute_dtype=None,
    )(8, None, jax.random.key(0))

    T, N = 10, 3
    key = jax.random.key(1)
    kx, ky, kd, kw, kwd = jax.random.split(key, 5)
    x = jax.random.normal(kx, (T, N, 8), jnp.float32)
    y = jax.random.normal(ky, (T, N, 8), jnp.float32)
    done = jax.random.bernoulli(kd, 0.3, (T, N, 1))

    # Warm the ring with a short pre-sequence (with a reset) so early windows
    # exercise the cache segment too.
    memory = layer.init_memory(N)
    warm = jax.random.normal(kw, (3, N, 8), jnp.float32)
    warm_done = jax.random.bernoulli(kwd, 0.3, (3, N, 1))
    for t in range(3):
        _, memory, _ = layer(warm[t], memory)
        memory = reset_memory(memory, warm_done[t])

    seq_out, _, ctx = layer.sequential_with_ctx(x, memory, done)
    boot = layer.eval_next_token(y, ctx)

    mem = memory
    for t in range(T):
        step_out, mem_adv, _ = layer(x[t], mem)
        np.testing.assert_allclose(np.asarray(seq_out[t]), np.asarray(step_out), atol=2e-5, rtol=1e-4)
        ref_boot, _, _ = layer(y[t], mem_adv)
        np.testing.assert_allclose(np.asarray(boot[t]), np.asarray(ref_boot), atol=2e-5, rtol=1e-4)
        mem = reset_memory(mem_adv, done[t])


def _make_transformer_agent(env, deferred):
    misc._KEY_COUNTER[0] = 1000
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=8,
        embed_dim=16,
        num_heads=2,
        attention_window=4,
        mlp_hidden_dims=(16,),
        sampler_epochs=1,
        sampler_mini_batches=1,
        normalize_observation=False,
    )
    agent = factory(env.spec)
    if deferred is not None:
        hooks = list(agent.state.hooks)
        for i, hook in enumerate(hooks):
            if isinstance(hook, ValueComputation):
                assert hook.deferred == "sequential"  # auto-selected for transformer critics
                hooks[i] = hook.replace(deferred=deferred)
        agent.state = agent.state.replace(hooks=tuple(hooks))
    return agent


def test_deferred_sequential_matches_per_step_hook(monkeypatch):
    """Full-rollout equality: value / next_value / post-rollout critic memory of
    deferred='sequential' vs the per-step (deferred=False) path, with random
    terminations AND truncations in the stream."""
    from cusrl_tpu.template.rollout import ScanRolloutDriver
    from cusrl_tpu.utils.config import CONFIG

    monkeypatch.setattr(CONFIG, "compute_dtype", None)

    results = {}
    for mode in ("sequential", False):
        env = DummyJaxEnvironment(observation_dim=8, action_dim=3, num_instances=4, done_prob=0.3)
        agent = _make_transformer_agent(env, None if mode == "sequential" else mode)
        driver = ScanRolloutDriver(agent, env, packed=False)
        transitions, _ = driver.collect(8)
        state, rollout, _ = agent._composite.pre_update(agent.state, dict(transitions))
        vc = next(h for h in state.hooks if isinstance(h, ValueComputation))
        results[mode] = (rollout["value"], rollout["next_value"], vc.memory)

    va, nva, mem_a = results["sequential"]
    vb, nvb, mem_b = results[False]
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nva), np.asarray(nvb), atol=3e-5, rtol=1e-4)

    # Ring memories are age-invariant representations: compare the unrolled
    # chronological caches (masked), not raw slots.
    agent = _make_transformer_agent(
        DummyJaxEnvironment(observation_dim=8, action_dim=3, num_instances=4), None
    )
    attn = agent.state.critic.backbone.modules[0].attention
    for ma, mb in ((mem_a["0"], mem_b["0"]),):
        ka, vala, maska = attn._unrolled_cache(ma)
        kb, valb, maskb = attn._unrolled_cache(mb)
        np.testing.assert_allclose(np.asarray(maska), np.asarray(maskb), atol=1e-6)
        m = np.asarray(maska)[:, None, :, None]
        np.testing.assert_allclose(np.asarray(ka) * m, np.asarray(kb) * m, atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(vala) * m, np.asarray(valb) * m, atol=3e-5, rtol=1e-4)


def test_deferred_sequential_trains_end_to_end():
    """Full PPO update through the deferred-sequential path (temporal sampler,
    BPTT value loss) stays finite and runs the sequence/eval passes."""
    from tests.helpers import create_dummy_env, run_training

    env = create_dummy_env(num_instances=4)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=8,
        embed_dim=16,
        num_heads=2,
        attention_window=4,
        mlp_hidden_dims=(16,),
        sampler_epochs=1,
        sampler_mini_batches=1,
        normalize_observation=True,
    )
    agent = factory(env.spec)
    vc = next(h for h in agent.state.hooks if isinstance(h, ValueComputation))
    assert vc.deferred == "sequential"
    metrics = run_training(agent, env, num_updates=2)
    assert all(np.isfinite(v) for v in metrics.values())


def test_deferred_auto_selection():
    """Auto policy: feedforward -> True, transformer -> 'sequential',
    GRU -> False (per-step), env kill-switch honored."""
    from tests.helpers import create_dummy_env

    env = create_dummy_env(num_instances=4)

    ff = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=4, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1,
    )(env.spec)
    assert next(h for h in ff.state.hooks if isinstance(h, ValueComputation)).deferred is True

    gru = cusrl_tpu.RecurrentPpoAgentFactory(
        num_steps_per_update=4, rnn_hidden_size=8, mlp_hidden_dims=(8,),
        sampler_epochs=1, sampler_mini_batches=1,
    )(env.spec)
    assert next(h for h in gru.state.hooks if isinstance(h, ValueComputation)).deferred is False

    # Samplers replaying BPTT from arbitrary offsets need per-step critic
    # memory snapshots -> auto falls back to the per-step path.
    from cusrl_tpu.nn.module.actor import ActorFactory
    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory
    from cusrl_tpu.nn.module.critic import ValueFactory
    from cusrl_tpu.nn.module.distribution import NormalDistFactory
    from cusrl_tpu.preset.optimizer import AdamFactory
    from cusrl_tpu.preset.ppo import ppo_hook_suite
    from cusrl_tpu.sampler.random_sampler import TemporalRandomSampler
    from cusrl_tpu.template.actor_critic import ActorCriticFactory

    backbone = CausalTransformerEncoderLayerFactory(embed_dim=16, num_heads=2, window=4)
    temporal = ActorCriticFactory(
        num_steps_per_update=8,
        actor_factory=ActorFactory(backbone_factory=backbone, distribution_factory=NormalDistFactory()),
        critic_factory=ValueFactory(backbone_factory=backbone),
        optimizer_factory=AdamFactory(lr=1e-3),
        sampler=TemporalRandomSampler(num_batches=1, batch_size=4, sequence_len=4),
        hooks=ppo_hook_suite(),
    )(env.spec)
    assert next(h for h in temporal.state.hooks if isinstance(h, ValueComputation)).deferred is False

    import os

    os.environ["CUSRL_TPU_DEFERRED_SEQ"] = "0"
    try:
        tf = cusrl_tpu.TransformerPpoAgentFactory(
            num_steps_per_update=4, embed_dim=16, num_heads=2, attention_window=4,
            mlp_hidden_dims=(16,), sampler_epochs=1, sampler_mini_batches=1,
        )(env.spec)
        assert next(h for h in tf.state.hooks if isinstance(h, ValueComputation)).deferred is False
    finally:
        del os.environ["CUSRL_TPU_DEFERRED_SEQ"]


def test_eval_next_token_fused_route_matches_modular(monkeypatch):
    """The FUSED branch of sequential_with_ctx/eval_next_token (pre/post
    Pallas kernels in interpret mode + lane ctx) must match the modular route
    — covers the head-split/RoPE-position plumbing the CPU suite otherwise
    never exercises (the fused path only engages on TPU)."""
    layer = CausalTransformerEncoderLayerFactory(
        embed_dim=16, num_heads=2, window=4, compute_dtype="bfloat16",
    )(8, None, jax.random.key(0))

    T, N = 8, 4
    keys = jax.random.split(jax.random.key(3), 3)
    x = jax.random.normal(keys[0], (T, N, 8), jnp.float32)
    y = jax.random.normal(keys[1], (T, N, 8), jnp.float32)
    done = jax.random.bernoulli(keys[2], 0.25, (T, N, 1))
    memory = layer.init_memory(N)

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "0")
    ref_out, _, ref_ctx = layer.sequential_with_ctx(x, memory, done)
    ref_boot = layer.eval_next_token(y, ref_ctx)

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    assert layer._fused_eligible(x, True)
    fused_out, _, fused_ctx = layer.sequential_with_ctx(x, memory, done)
    fused_boot = layer.eval_next_token(y, fused_ctx)

    np.testing.assert_allclose(
        np.asarray(fused_out, np.float32), np.asarray(ref_out, np.float32), atol=5e-2, rtol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(fused_boot, np.float32), np.asarray(ref_boot, np.float32), atol=5e-2, rtol=5e-2
    )


def test_explicit_sequential_with_per_step_sampler_raises():
    """deferred='sequential' records no per-step critic memory; explicit use
    with a requires_per_step_memory sampler must be rejected at init."""
    from cusrl_tpu.nn.module.actor import ActorFactory
    from cusrl_tpu.nn.module.critic import ValueFactory
    from cusrl_tpu.nn.module.distribution import NormalDistFactory
    from cusrl_tpu.preset.optimizer import AdamFactory
    from cusrl_tpu.preset.ppo import ppo_hook_suite
    from cusrl_tpu.sampler.random_sampler import TemporalRandomSampler
    from cusrl_tpu.template.actor_critic import ActorCriticFactory
    from tests.helpers import create_dummy_env

    env = create_dummy_env(num_instances=4)
    backbone = CausalTransformerEncoderLayerFactory(embed_dim=16, num_heads=2, window=4)
    hooks = []
    for hook in ppo_hook_suite():
        if isinstance(hook, ValueComputation):
            hook = hook.replace(deferred="sequential")
        hooks.append(hook)
    factory = ActorCriticFactory(
        num_steps_per_update=8,
        actor_factory=ActorFactory(backbone_factory=backbone, distribution_factory=NormalDistFactory()),
        critic_factory=ValueFactory(backbone_factory=backbone),
        optimizer_factory=AdamFactory(lr=1e-3),
        sampler=TemporalRandomSampler(num_batches=1, batch_size=4, sequence_len=4),
        hooks=hooks,
    )
    with pytest.raises(ValueError, match="per-step"):
        factory(env.spec)
