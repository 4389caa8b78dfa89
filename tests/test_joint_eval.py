"""JointPolicyValueEvaluation: the stacked actor+critic pass must be numerically
equivalent to the separate OnPolicyPreparation/ValueLoss forward passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.hook.on_policy.joint_eval import JointPolicyValueEvaluation
from cusrl_tpu.template.hook import find_hook
from cusrl_tpu.template.rollout import ScanRolloutDriver


def make_agent(seed=0, **kwargs):
    cusrl_tpu.set_global_seed(seed)
    from cusrl_tpu.utils import misc

    misc._KEY_COUNTER[0] = 0
    env = VelocityLocomotionEnv(num_instances=32, observation_dim=16, action_dim=4, seed=1)
    defaults = dict(
        num_steps_per_update=8,
        actor_hidden_dims=(32, 32),
        critic_hidden_dims=(32, 32),
        sampler_epochs=2,
        sampler_mini_batches=2,
        normalize_observation=True,
    )
    defaults.update(kwargs)
    agent = cusrl_tpu.PpoAgentFactory(**defaults)(env.spec)
    return env, agent


def test_forward_equivalence():
    _, agent = make_agent(fuse_actor_critic_evaluation=True)
    state = agent.state
    index, hook = find_hook(state.hooks, "joint_policy_value_evaluation")
    assert isinstance(hook, JointPolicyValueEvaluation)

    observation = jax.random.normal(jax.random.PRNGKey(3), (64, 16), jnp.float32)
    batch = {"observation": observation}
    _, batch, obj, _ = hook.objective(state, {}, batch)
    assert obj is None

    ref_dist, _, ref_aux = state.actor(observation)
    ref_value, _, _ = state.critic(observation)
    for key in ref_dist:
        np.testing.assert_allclose(
            np.asarray(batch["curr_action_dist"][key], np.float32),
            np.asarray(ref_dist[key], np.float32),
            rtol=1e-5,
            atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(batch["curr_value"]), np.asarray(ref_value), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(batch["actor_intermediate"]["backbone.output"], np.float32),
        np.asarray(ref_aux["backbone.output"], np.float32),
        rtol=1e-5,
        atol=1e-5,
    )


def run_iters(env, agent, n=2):
    driver = ScanRolloutDriver(agent, env)
    for _ in range(n):
        driver.collect_and_update(agent.num_steps_per_update)
    jax.block_until_ready(agent.state)
    return np.asarray(agent.state.actor.backbone.layers[0].weight)


def test_gradient_equivalence():
    """The fused objective fold must produce the same losses AND the same
    gradients for every parameter leaf as the separate forward passes (any real
    discrepancy shows up here undamped; training-trajectory comparisons only
    bound Adam-amplified rounding noise)."""
    from cusrl_tpu.nn.base import combine, partition
    from cusrl_tpu.template.actor_critic import params_view, state_with_view
    from cusrl_tpu.template.hook import HookComposite

    _, agent = make_agent(fuse_actor_critic_evaluation=True)
    state = agent.state
    composite = HookComposite()

    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    observation = jax.random.normal(keys[0], (64, 16), jnp.float32)
    action = jax.random.normal(keys[1], (64, 4), jnp.float32)
    dist, _, _ = state.actor(observation)
    batch = {
        "observation": observation,
        "action": action,
        "action_logp": state.actor.compute_logp(dist, action),
        "action_dist": dist,
        "advantage": jax.random.normal(keys[2], (64, 1), jnp.float32),
        "return": jax.random.normal(keys[3], (64, 1), jnp.float32),
        "value": jax.random.normal(keys[4], (64, 1), jnp.float32),
    }
    metadata = {
        "temporal": False,
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

    index, joint = find_hook(state.hooks, "joint_policy_value_evaluation")
    hooks_off = list(state.hooks)
    hooks_off[index] = joint.with_active(False)

    loss_fused, obj_fused, grads_fused = grads_for(state)
    loss_plain, obj_plain, grads_plain = grads_for(state.replace(hooks=tuple(hooks_off)))

    np.testing.assert_allclose(np.asarray(loss_fused), np.asarray(loss_plain), rtol=1e-6)
    assert set(obj_fused) == set(obj_plain)
    # The static `active` flag lives in the treedef, so compare leaf-by-leaf.
    fused_leaves = jax.tree_util.tree_flatten_with_path(grads_fused)[0]
    plain_leaves = jax.tree_util.tree_flatten_with_path(grads_plain)[0]
    assert len(fused_leaves) == len(plain_leaves)
    for (path_f, leaf_f), (path_p, leaf_p) in zip(fused_leaves, plain_leaves):
        assert jax.tree_util.keystr(path_f) == jax.tree_util.keystr(path_p)
        np.testing.assert_allclose(
            np.asarray(leaf_f),
            np.asarray(leaf_p),
            rtol=1e-4,
            atol=1e-6,
            err_msg=jax.tree_util.keystr(path_f),
        )


def test_training_equivalence_bf16_loose():
    """Under bfloat16, einsum/dot backward passes round differently and Adam's
    sign-like steps amplify that; bound the drift at a few step sizes."""
    env0, plain = make_agent(fuse_actor_critic_evaluation=False)
    w_plain = run_iters(env0, plain)
    env1, fused = make_agent(fuse_actor_critic_evaluation=True)
    w_fused = run_iters(env1, fused)
    np.testing.assert_allclose(w_fused, w_plain, atol=8e-3, rtol=0)


def test_recurrent_backbones_use_sequential_joint_eval():
    # Round 4: recurrent presets route fuse_actor_critic_evaluation to the
    # vmapped-stack hook (JointSequentialEvaluation) instead of rejecting.
    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=16, action_dim=4, seed=1)
    factory = cusrl_tpu.RecurrentPpoAgentFactory(
        num_steps_per_update=8, rnn_hidden_size=16, mlp_hidden_dims=(16,),
        fuse_actor_critic_evaluation=True,
    )
    agent = factory(env.spec)
    _, hook = find_hook(agent.state.hooks, "joint_sequential_evaluation")
    from cusrl_tpu.hook.on_policy.joint_seq_eval import JointSequentialEvaluation

    assert isinstance(hook, JointSequentialEvaluation)


def test_rejects_mismatched_shapes():
    with pytest.raises(ValueError, match="fusable"):
        make_agent(
            fuse_actor_critic_evaluation=True,
            actor_hidden_dims=(32, 32),
            critic_hidden_dims=(64, 32),
        )


def test_head_fused_glue_matches_separate_passes(monkeypatch):
    """The head-fused branch (kernel computes mean/value directly) must produce
    the same batch entries and parameter gradients as the separate passes.  On
    CPU the fused ops lower to their XLA reference, so this validates the glue:
    std construction, batch keys, and gradient flow to heads + std_param."""
    from cusrl_tpu.nn.module.mlp import Mlp

    _, agent = make_agent(fuse_actor_critic_evaluation=True)
    state = agent.state
    index, hook = find_hook(state.hooks, "joint_policy_value_evaluation")
    hook = hook.replace(fuse_heads=True)  # off by default (see joint_eval.py)
    assert not hook.expose_latent

    monkeypatch.setattr(Mlp, "_can_fuse", lambda self, x: True)
    observation = jax.random.normal(jax.random.PRNGKey(5), (64, 16), jnp.float32)
    adv = jax.random.normal(jax.random.PRNGKey(6), (64, 4), jnp.float32)

    def loss_via(hook_obj, st):
        batch = {"observation": observation}
        _, batch, _, _ = hook_obj.objective(st, {}, batch)
        dist = batch["curr_action_dist"]
        return (
            jnp.mean(dist["mean"] * adv)
            + jnp.mean(dist["std"])
            + jnp.mean(jnp.square(batch["curr_value"] - 1.0))
        )

    def ref_loss(st):
        dist, _, _ = st.actor(observation)
        value, _, _ = st.critic(observation)
        return jnp.mean(dist["mean"] * adv) + jnp.mean(dist["std"]) + jnp.mean(jnp.square(value - 1.0))

    val_fused = loss_via(hook, state)
    val_ref = ref_loss(state)
    np.testing.assert_allclose(np.asarray(val_fused), np.asarray(val_ref), rtol=2e-5, atol=2e-5)

    def grad_of(fn):
        def wrapped(params):
            st = state.replace(actor=params[0], critic=params[1])
            return fn(st)

        return jax.grad(wrapped)((state.actor, state.critic))

    g_fused = grad_of(lambda st: loss_via(hook, st))
    g_ref = grad_of(ref_loss)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


def test_head_fused_exposes_latent_for_representation_hooks():
    """With a representation hook registered, init flips expose_latent and the
    fused path publishes actor_intermediate."""
    from cusrl_tpu.hook.auxiliary.representation import ReturnPrediction
    from cusrl_tpu.nn.module.mlp import Mlp

    cusrl_tpu.set_global_seed(2)
    env = VelocityLocomotionEnv(num_instances=16, observation_dim=16, action_dim=4, seed=1)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8,
        actor_hidden_dims=(32, 32),
        critic_hidden_dims=(32, 32),
        sampler_epochs=1,
        sampler_mini_batches=2,
        fuse_actor_critic_evaluation=True,
    ).to_underlying()
    factory.register_hook(ReturnPrediction(), after="joint_policy_value_evaluation")
    agent = factory(env.spec)
    _, hook = find_hook(agent.state.hooks, "joint_policy_value_evaluation")
    hook = hook.replace(fuse_heads=True)
    hook = hook.post_init(agent)
    assert hook.expose_latent

    import unittest.mock as mock

    with mock.patch.object(Mlp, "_can_fuse", lambda self, x: True):
        observation = jax.random.normal(jax.random.PRNGKey(7), (32, 16), jnp.float32)
        batch = {"observation": observation}
        _, batch, _, _ = hook.objective(agent.state, {}, batch)
    assert "backbone.output" in batch["actor_intermediate"]
    ref_aux = agent.state.actor(observation)[2]
    np.testing.assert_allclose(
        np.asarray(batch["actor_intermediate"]["backbone.output"], np.float32),
        np.asarray(ref_aux["backbone.output"], np.float32),
        atol=1e-5,
    )


@pytest.mark.parametrize("fuse_heads", [False, True])
def test_fused_path_handles_3d_batches(monkeypatch, fuse_heads):
    """Temporal minibatches are [T, Ns, D]; the fused kernel path must flatten
    leading dims before the 2-D pair kernel and restore them on the outputs
    (advisor round-2 finding: 3-D inputs crashed at trace time)."""
    from cusrl_tpu.nn.module.mlp import Mlp

    _, agent = make_agent(fuse_actor_critic_evaluation=True)
    state = agent.state
    _, hook = find_hook(state.hooks, "joint_policy_value_evaluation")
    if fuse_heads:
        hook = hook.replace(fuse_heads=True)

    monkeypatch.setattr(Mlp, "_can_fuse", lambda self, x: True)
    observation = jax.random.normal(jax.random.PRNGKey(11), (4, 16, 16), jnp.float32)
    batch = {"observation": observation}
    _, batch, _, _ = hook.objective(state, {"temporal": True}, batch)

    ref_dist, _, _ = state.actor(observation)
    ref_value, _, _ = state.critic(observation)
    assert batch["curr_value"].shape == ref_value.shape
    for key in ref_dist:
        assert batch["curr_action_dist"][key].shape == ref_dist[key].shape
        np.testing.assert_allclose(
            np.asarray(batch["curr_action_dist"][key], np.float32),
            np.asarray(ref_dist[key], np.float32),
            rtol=2e-5,
            atol=2e-5,
        )
    np.testing.assert_allclose(
        np.asarray(batch["curr_value"]), np.asarray(ref_value), rtol=2e-5, atol=2e-5
    )


def test_post_update_strips_kl_cache_sentinel():
    """compute_rollout_kl caches its shared pass under "__post_update_kl__" in
    the rollout dict; the composite must strip it after the fold so the rollout
    stays a pure [T, N] data dict (advisor round-2 finding)."""
    from cusrl_tpu.hook.on_policy.stats import compute_rollout_kl
    from cusrl_tpu.template.hook import HookComposite

    env, agent = make_agent()
    state = agent.state
    T, N = 4, 8
    observation = jax.random.normal(jax.random.PRNGKey(13), (T, N, 16), jnp.float32)
    dist, _, _ = state.actor(observation)
    action = jax.random.normal(jax.random.PRNGKey(14), (T, N, 4), jnp.float32)
    rollout = {
        "observation": observation,
        "action": action,
        "action_dist": dist,
        "action_logp": state.actor.compute_logp(dist, action),
        "advantage": jnp.ones((T, N, 1), jnp.float32),
    }
    kl, _ = compute_rollout_kl(state, rollout)
    assert "__post_update_kl__" in rollout
    composite = HookComposite()
    state, metrics = composite.post_update(state, rollout, None)
    assert "__post_update_kl__" not in rollout
    assert "kl_divergence" in metrics
