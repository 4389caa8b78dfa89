"""TransformerPpoAgentFactory: end-to-end training through the attention
backbone (temporal sampling, rolling KV cache, done-resets)."""

import numpy as np

import cusrl_tpu
from tests.helpers import create_dummy_env, run_training


def test_transformer_ppo_trains_and_acts():
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
    assert agent.state.actor.backbone.is_recurrent
    metrics = run_training(agent, env, num_updates=2)
    assert all(np.isfinite(v) for v in metrics.values())
    obs, _, _ = env.reset()
    action = agent.act(obs)
    assert np.isfinite(np.asarray(action)).all()


def test_transformer_stepwise_matches_sequence_mode():
    """The consistency contract: sequence-mode (batched/banded) recurrence must
    equal the stepwise rollout exactly (CLAUDE.md invariant)."""
    import jax
    import jax.numpy as jnp

    from cusrl_tpu.nn.module.causal_attn import CausalTransformerEncoderLayerFactory

    layer = CausalTransformerEncoderLayerFactory(
        embed_dim=16, num_heads=2, window=4, compute_dtype=None
    )(8, None, jax.random.key(0))

    T, N = 12, 3
    x = jax.random.normal(jax.random.key(1), (T, N, 8), jnp.float32)
    done = jax.random.bernoulli(jax.random.key(2), 0.2, (T, N, 1))

    memory = layer.init_memory(N)
    outs = []
    mem = memory
    from cusrl_tpu.nn.base import reset_memory

    for t in range(T):
        out, mem, _ = layer(x[t], mem)
        outs.append(out)
        mem = reset_memory(mem, done[t])
    stepwise = jnp.stack(outs)

    seq_out, _, _ = layer(x, memory, sequential=True, done=done)
    np.testing.assert_allclose(np.asarray(seq_out), np.asarray(stepwise), atol=1e-5)
