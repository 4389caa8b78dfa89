"""JointSequentialEvaluation: the vmapped stacked actor+critic sequence pass
must be numerically equivalent to the separate OnPolicyPreparation/ValueLoss
forward passes, for both transformer and GRU backbones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.hook.on_policy.joint_seq_eval import JointSequentialEvaluation
from cusrl_tpu.template.hook import find_hook
from cusrl_tpu.template.rollout import ScanRolloutDriver


def make_agent(seed=0, algo="transformer", **kwargs):
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=32, observation_dim=16, action_dim=4, seed=1)
    defaults = dict(
        num_steps_per_update=8,
        sampler_epochs=2,
        sampler_mini_batches=2,
        normalize_observation=True,
    )
    defaults.update(kwargs)
    if algo == "transformer":
        factory = cusrl_tpu.TransformerPpoAgentFactory(
            embed_dim=16, num_heads=2, attention_window=4, mlp_hidden_dims=(16,), **defaults
        )
    else:
        factory = cusrl_tpu.RecurrentPpoAgentFactory(
            rnn_type="gru", rnn_hidden_size=16, mlp_hidden_dims=(16,), **defaults
        )
    return env, factory(env.spec)


@pytest.mark.parametrize("algo", ["transformer", "gru"])
def test_sequence_forward_equivalence(algo):
    _, agent = make_agent(algo=algo, fuse_actor_critic_evaluation=True)
    state = agent.state
    _, hook = find_hook(state.hooks, "joint_sequential_evaluation")
    assert isinstance(hook, JointSequentialEvaluation)

    t_len, batch_size = 8, 16
    observation = jax.random.normal(jax.random.PRNGKey(3), (t_len, batch_size, 16), jnp.float32)
    done = jax.random.uniform(jax.random.PRNGKey(4), (t_len, batch_size, 1)) < 0.2
    actor_memory = state.actor.init_memory(batch_size)
    critic_memory = state.critic.init_memory(batch_size)
    batch = {
        "observation": observation,
        "done": done,
        "actor_memory": jax.tree.map(lambda m: jnp.broadcast_to(m, (1, *m.shape)) if m.ndim else
                                     jnp.broadcast_to(m, (1, batch_size)), actor_memory),
        "critic_memory": jax.tree.map(lambda m: jnp.broadcast_to(m, (1, *m.shape)) if m.ndim else
                                      jnp.broadcast_to(m, (1, batch_size)), critic_memory),
    }
    _, batch, obj, _ = hook.objective(state, {"temporal": True}, batch)
    assert obj is None

    ref_dist, _, ref_aux = state.actor(observation, actor_memory, sequential=True, done=done)
    ref_value, _, _ = state.critic(observation, critic_memory, sequential=True, done=done)
    for key in ref_dist:
        np.testing.assert_allclose(
            np.asarray(batch["curr_action_dist"][key], np.float32),
            np.asarray(ref_dist[key], np.float32),
            rtol=1e-4,
            atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(batch["curr_value"]), np.asarray(ref_value), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(batch["actor_intermediate"]["backbone.output"], np.float32),
        np.asarray(ref_aux["backbone.output"], np.float32),
        rtol=1e-4,
        atol=1e-5,
    )


@pytest.mark.parametrize("algo", ["transformer", "gru"])
def test_gradient_equivalence(algo):
    """The vmapped-stack objective fold must produce the same losses AND the
    same gradients for every parameter leaf as the separate sequence passes
    (compared on ONE agent state with the hook toggled, so init-key allocation
    is identical)."""
    from cusrl_tpu.nn.base import combine, partition
    from cusrl_tpu.template.actor_critic import params_view, state_with_view
    from cusrl_tpu.template.hook import HookComposite

    _, agent = make_agent(algo=algo, fuse_actor_critic_evaluation=True)
    state = agent.state
    composite = HookComposite()

    t_len, batch_size = 8, 16
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    observation = jax.random.normal(keys[0], (t_len, batch_size, 16), jnp.float32)
    action = jax.random.normal(keys[1], (t_len, batch_size, 4), jnp.float32)
    done = jax.random.uniform(keys[5], (t_len, batch_size, 1)) < 0.2
    actor_memory = state.actor.init_memory(batch_size)
    critic_memory = state.critic.init_memory(batch_size)
    dist, _, _ = state.actor(observation, actor_memory, sequential=True, done=done)
    lead1 = lambda m: jax.tree.map(
        lambda x: x[None] if x.ndim else jnp.broadcast_to(x, (1, batch_size)), m
    )
    batch = {
        "observation": observation,
        "action": action,
        "action_logp": state.actor.compute_logp(dist, action),
        "action_dist": dist,
        "done": done,
        "actor_memory": lead1(actor_memory),
        "critic_memory": lead1(critic_memory),
        "advantage": jax.random.normal(keys[2], (t_len, batch_size, 1), jnp.float32),
        "return": jax.random.normal(keys[3], (t_len, batch_size, 1), jnp.float32),
        "value": jax.random.normal(keys[4], (t_len, batch_size, 1), jnp.float32),
    }
    metadata = {
        "temporal": True,
        "epoch_index": 0,
        "mini_batch_index": 0,
        "total_epochs": 1,
        "total_mini_batches": 1,
    }

    def grads_for(st0):
        params, rest = partition(params_view(st0))

        def loss_fn(p):
            st = state_with_view(st0, combine(p, rest))
            _, _, objectives, _ = composite.objective(st, metadata, dict(batch))
            return sum(jnp.asarray(v, jnp.float32) for v in objectives.values()), objectives

        (loss, objectives), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, objectives, grads

    from cusrl_tpu.template.hook import find_hook

    index, joint = find_hook(state.hooks, "joint_sequential_evaluation")
    hooks_off = list(state.hooks)
    hooks_off[index] = joint.with_active(False)

    loss_fused, obj_fused, grads_fused = grads_for(state)
    loss_plain, obj_plain, grads_plain = grads_for(state.replace(hooks=tuple(hooks_off)))

    np.testing.assert_allclose(np.asarray(loss_fused), np.asarray(loss_plain), rtol=1e-5)
    assert set(obj_fused) == set(obj_plain)
    fused_leaves = jax.tree_util.tree_flatten_with_path(grads_fused)[0]
    plain_leaves = jax.tree_util.tree_flatten_with_path(grads_plain)[0]
    assert len(fused_leaves) == len(plain_leaves)
    for (path_f, leaf_f), (path_p, leaf_p) in zip(fused_leaves, plain_leaves):
        assert jax.tree_util.keystr(path_f) == jax.tree_util.keystr(path_p)
        np.testing.assert_allclose(
            np.asarray(leaf_f),
            np.asarray(leaf_p),
            rtol=1e-4,
            atol=1e-5,
            err_msg=jax.tree_util.keystr(path_f),
        )


def test_non_temporal_batch_passthrough():
    _, agent = make_agent(algo="transformer", fuse_actor_critic_evaluation=True)
    state = agent.state
    _, hook = find_hook(state.hooks, "joint_sequential_evaluation")
    batch = {"observation": jnp.zeros((8, 16))}
    _, batch, _, _ = hook.objective(state, {"temporal": False}, batch)
    assert "curr_action_dist" not in batch  # defers to the standard paths


def test_mismatched_backbones_rejected():
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=16, action_dim=4, seed=1)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=8,
        embed_dim=16,
        num_heads=2,
        attention_window=4,
        mlp_hidden_dims=(16,),
        fuse_actor_critic_evaluation=True,
    )
    underlying = factory.to_underlying()
    # Critic with a different architecture cannot be stacked.
    from cusrl_tpu.nn.module.critic import ValueFactory
    from cusrl_tpu.nn.module.rnn import RnnFactory

    underlying.critic_factory = ValueFactory(backbone_factory=RnnFactory(cell="gru", hidden_size=16))
    with pytest.raises(ValueError, match="stackable"):
        underlying(env.spec)


def make_pair_agent(seed=0):
    """Pair-kernel-eligible shape: embed != obs dim so the encoder layer has an
    input projection (the bench configuration; the fused kernels require it)."""
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=32, observation_dim=16, action_dim=4, seed=1)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        embed_dim=32, num_heads=2, attention_window=4, mlp_hidden_dims=(16,),
        num_steps_per_update=8, sampler_epochs=2, sampler_mini_batches=2,
        normalize_observation=True, fuse_actor_critic_evaluation=True,
    )
    return env, factory(env.spec)


def test_pair_kernel_route_forward_equivalence(monkeypatch):
    """Round-5 pair-kernel route (two pre/post chains per Pallas program + one
    env-concatenated lane pass): same outputs as the modular per-module passes,
    and the route is actually taken."""
    import cusrl_tpu.nn.module.causal_attn as ca

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    _, agent = make_pair_agent()
    state = agent.state
    _, hook = find_hook(state.hooks, "joint_sequential_evaluation")

    calls = []
    real = ca.fused_pair_sequence

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(ca, "fused_pair_sequence", spy)

    t_len, batch_size = 8, 16
    observation = jax.random.normal(jax.random.PRNGKey(13), (t_len, batch_size, 16), jnp.float32)
    done = jax.random.uniform(jax.random.PRNGKey(14), (t_len, batch_size, 1)) < 0.2
    actor_memory = state.actor.init_memory(batch_size)
    critic_memory = state.critic.init_memory(batch_size)
    batch = {
        "observation": observation,
        "done": done,
        "actor_memory": jax.tree.map(lambda m: jnp.broadcast_to(m, (1, *m.shape)) if m.ndim else
                                     jnp.broadcast_to(m, (1, batch_size)), actor_memory),
        "critic_memory": jax.tree.map(lambda m: jnp.broadcast_to(m, (1, *m.shape)) if m.ndim else
                                      jnp.broadcast_to(m, (1, batch_size)), critic_memory),
    }
    _, batch, _, _ = hook.objective(state, {"temporal": True}, batch)
    assert calls, "pair-kernel route was not taken under force mode"

    # Modular reference on the same state (fused singles route, same kernels).
    ref_dist, _, _ = state.actor(observation, actor_memory, sequential=True, done=done)
    ref_value, _, _ = state.critic(observation, critic_memory, sequential=True, done=done)
    for key in ref_dist:
        np.testing.assert_allclose(
            np.asarray(batch["curr_action_dist"][key], np.float32),
            np.asarray(ref_dist[key], np.float32),
            rtol=2e-2, atol=2e-2,
        )
    np.testing.assert_allclose(
        np.asarray(batch["curr_value"]), np.asarray(ref_value), rtol=2e-2, atol=2e-2
    )


def test_pair_kernel_route_gradient_equivalence(monkeypatch):
    """Pair-kernel objective fold gradients == separate-pass gradients."""
    from cusrl_tpu.nn.base import combine, partition
    from cusrl_tpu.template.actor_critic import params_view, state_with_view
    from cusrl_tpu.template.hook import HookComposite

    monkeypatch.setenv("CUSRL_TPU_FUSED_TRANSFORMER", "force")
    _, agent = make_pair_agent()
    state = agent.state
    composite = HookComposite()

    t_len, batch_size = 8, 12
    keys = jax.random.split(jax.random.PRNGKey(77), 6)
    observation = jax.random.normal(keys[0], (t_len, batch_size, 16), jnp.float32)
    action = jax.random.normal(keys[1], (t_len, batch_size, 4), jnp.float32)
    done = jax.random.uniform(keys[5], (t_len, batch_size, 1)) < 0.2
    actor_memory = state.actor.init_memory(batch_size)
    critic_memory = state.critic.init_memory(batch_size)
    dist, _, _ = state.actor(observation, actor_memory, sequential=True, done=done)
    lead1 = lambda m: jax.tree.map(
        lambda x: x[None] if x.ndim else jnp.broadcast_to(x, (1, batch_size)), m
    )
    batch = {
        "observation": observation,
        "action": action,
        "action_logp": state.actor.compute_logp(dist, action),
        "action_dist": dist,
        "done": done,
        "actor_memory": lead1(actor_memory),
        "critic_memory": lead1(critic_memory),
        "advantage": jax.random.normal(keys[2], (t_len, batch_size, 1), jnp.float32),
        "return": jax.random.normal(keys[3], (t_len, batch_size, 1), jnp.float32),
        "value": jax.random.normal(keys[4], (t_len, batch_size, 1), jnp.float32),
    }
    metadata = {
        "temporal": True,
        "epoch_index": 0,
        "mini_batch_index": 0,
        "total_epochs": 1,
        "total_mini_batches": 1,
    }

    def grads_for(st0):
        params, rest = partition(params_view(st0))

        def loss_fn(p):
            st = state_with_view(st0, combine(p, rest))
            _, _, objectives, _ = composite.objective(st, metadata, dict(batch))
            return sum(jnp.asarray(v, jnp.float32) for v in objectives.values()), objectives

        (loss, objectives), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, objectives, grads

    index, joint = find_hook(state.hooks, "joint_sequential_evaluation")
    hooks_off = list(state.hooks)
    hooks_off[index] = joint.with_active(False)

    loss_pair, _, grads_pair = grads_for(state)
    loss_plain, _, grads_plain = grads_for(state.replace(hooks=tuple(hooks_off)))

    np.testing.assert_allclose(np.asarray(loss_pair), np.asarray(loss_plain), rtol=2e-3, atol=2e-3)
    pair_leaves = jax.tree_util.tree_flatten_with_path(grads_pair)[0]
    plain_leaves = jax.tree_util.tree_flatten_with_path(grads_plain)[0]
    assert len(pair_leaves) == len(plain_leaves)
    for (path_p, leaf_p), (path_q, leaf_q) in zip(pair_leaves, plain_leaves):
        assert jax.tree_util.keystr(path_p) == jax.tree_util.keystr(path_q)
        np.testing.assert_allclose(
            np.asarray(leaf_p, np.float32),
            np.asarray(leaf_q, np.float32),
            rtol=8e-2, atol=2e-2,
            err_msg=jax.tree_util.keystr(path_p),
        )
