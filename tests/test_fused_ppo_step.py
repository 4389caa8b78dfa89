"""Fused PPO step kernel + FusedPpoUpdate hook: the one-kernel objective must
match the separate hook chain (ValueLoss + OnPolicyPreparation +
PpoSurrogateLoss + EntropyLoss) in losses, metrics, and every parameter
gradient.

Counterpart role: the reference computes these losses as separate torch ops
(cusrl/hook/on_policy/ppo.py:10-85, value.py:85-145, common.py:12-49) and
trusts torch.compile to fuse them; here the Pallas mega-kernel must be
bit-equivalent to the XLA chain it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.nn.kernels.fused_ppo_step import fused_ppo_step, ppo_step_reference
from cusrl_tpu.template.hook import HookComposite, find_hook
from cusrl_tpu.template.rollout import ScanRolloutDriver


def make_params(key, dims):
    ws, bs = [], []
    for i in range(len(dims) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32) / np.sqrt(dims[i]))
        bs.append(jax.random.normal(k2, (1, dims[i + 1]), jnp.float32) * 0.1)
    return tuple(ws), tuple(bs)


def make_problem(key, n=96, obs_dim=24, a_dim=6, v_dim=1, dims=(64, 32)):
    keys = jax.random.split(key, 12)
    full = (obs_dim,) + dims
    wsa, bsa = make_params(keys[0], full)
    wsc, bsc = make_params(keys[1], full)
    wm = jax.random.normal(keys[2], (dims[-1], a_dim), jnp.float32) * 0.2
    bm = jax.random.normal(keys[3], (1, a_dim), jnp.float32) * 0.1
    wv = jax.random.normal(keys[4], (dims[-1], v_dim), jnp.float32) * 0.2
    bv = jax.random.normal(keys[5], (1, v_dim), jnp.float32) * 0.1
    std = jnp.exp(jax.random.normal(keys[6], (a_dim,), jnp.float32) * 0.2)
    xa = jax.random.normal(keys[7], (n, obs_dim), jnp.float32)
    xc = jax.random.normal(keys[8], (n, obs_dim), jnp.float32)
    action = jax.random.normal(keys[9], (n, a_dim), jnp.float32)
    advantage = jax.random.normal(keys[10], (n, 1), jnp.float32)
    returns = jax.random.normal(keys[11], (n, v_dim), jnp.float32)
    # old logp from a nearby policy so the clip boundary is actually exercised
    mean0 = jax.random.normal(jax.random.fold_in(key, 99), (n, a_dim), jnp.float32) * 0.1
    z = (action - mean0) / std
    old_logp = jnp.sum(
        -0.5 * jnp.square(z) - jnp.log(std) - 0.5 * np.log(2 * np.pi), axis=-1, keepdims=True
    )
    old_value = jax.random.normal(jax.random.fold_in(key, 98), (n, v_dim), jnp.float32)
    return dict(
        xa=xa, xc=xc, wsa=wsa, bsa=bsa, wsc=wsc, bsc=bsc, wm=wm, bm=bm, wv=wv, bv=bv,
        std=std, action=action, old_logp=old_logp, advantage=advantage,
        old_value=old_value, returns=returns,
    )


@pytest.mark.parametrize("loss_clip", [None, 0.2])
@pytest.mark.parametrize("n", [96, 100])  # 100: padding/masking path (block 32)
def test_kernel_matches_reference(loss_clip, n):
    p = make_problem(jax.random.key(0), n=n)

    def run(params, use_pallas):
        (wsa, bsa), (wsc, bsc), (wm, bm, wv, bv, std) = params
        loss, metrics = fused_ppo_step(
            p["xa"], p["xc"], wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
            p["action"], p["old_logp"], p["advantage"], p["old_value"], p["returns"],
            0.2, 1.0, 0.5, "elu", True,
            loss_clip=loss_clip, use_pallas=use_pallas, block_rows=32, interpret=use_pallas,
        )
        return loss, metrics

    params = (
        (p["wsa"], p["bsa"]), (p["wsc"], p["bsc"]),
        (p["wm"], p["bm"], p["wv"], p["bv"], p["std"]),
    )
    loss_k, metrics_k = run(params, True)
    loss_r, metrics_r = run(params, False)
    np.testing.assert_allclose(np.asarray(loss_k), np.asarray(loss_r), atol=1e-3, rtol=1e-3)
    for got, want in zip(metrics_k, metrics_r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3, rtol=2e-3)

    g_k = jax.grad(lambda prm: run(prm, True)[0])(params)
    g_r = jax.grad(lambda prm: run(prm, False)[0])(params)
    flat_k = jax.tree_util.tree_flatten_with_path(g_k)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    for (path, leaf_k), (_, leaf_r) in zip(flat_k, flat_r):
        np.testing.assert_allclose(
            np.asarray(leaf_k), np.asarray(leaf_r), atol=5e-3, rtol=3e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_reference_matches_hook_chain_math():
    """ppo_step_reference must equal the separate surrogate/value-loss formulas
    from the PPO hooks on the same inputs."""
    from cusrl_tpu.hook.on_policy.ppo import ppo_surrogate_loss
    from cusrl_tpu.nn.kernels.fused_mlp import _reference

    p = make_problem(jax.random.key(1))
    loss, metrics = ppo_step_reference(
        p["xa"], p["xc"], p["wsa"], p["bsa"], p["wsc"], p["bsc"],
        p["wm"], p["bm"], p["wv"], p["bv"], p["std"],
        p["action"], p["old_logp"], p["advantage"], p["old_value"], p["returns"],
        0.2, 1.0, 0.5, "elu", True, None,
    )
    la = _reference(p["xa"], p["wsa"], p["bsa"], "elu", True)
    lc = _reference(p["xc"], p["wsc"], p["bsc"], "elu", True)
    mean = la.astype(jnp.float32) @ p["wm"] + p["bm"]
    vhat = lc.astype(jnp.float32) @ p["wv"] + p["bv"]
    z = (p["action"] - mean) / p["std"]
    logp = jnp.sum(
        -0.5 * jnp.square(z) - jnp.log(p["std"]) - 0.5 * np.log(2 * np.pi), axis=-1, keepdims=True
    )
    prob_ratio = jnp.exp(logp - p["old_logp"])
    expected_surr = ppo_surrogate_loss(p["advantage"], prob_ratio, 0.2)
    expected_value = jnp.square(vhat - p["returns"]).mean()
    np.testing.assert_allclose(
        np.asarray(loss), np.asarray(expected_surr + 0.5 * expected_value), rtol=1e-6
    )


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


@pytest.mark.parametrize("value_loss_clip", [None, 0.2])
def test_hook_matches_separate_hooks(value_loss_clip):
    """FusedPpoUpdate's objective fold must produce the same total loss and the
    same actor/critic gradients as the separate-hook suite."""
    from cusrl_tpu.nn.base import combine, partition
    from cusrl_tpu.template.actor_critic import params_view, state_with_view

    _, fused_agent = make_agent(fused_ppo_update=True, value_loss_clip=value_loss_clip)
    _, plain_agent = make_agent(fused_ppo_update=False, value_loss_clip=value_loss_clip)
    composite = HookComposite()

    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    observation = jax.random.normal(keys[0], (64, 16), jnp.float32)
    action = jax.random.normal(keys[1], (64, 4), jnp.float32)
    dist, _, _ = fused_agent.state.actor(observation)
    batch = {
        "observation": observation,
        "action": action,
        "action_logp": fused_agent.state.actor.compute_logp(dist, action),
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

    def loss_and_grads(agent):
        st0 = agent.state
        params, rest = partition(params_view(st0))

        def loss_fn(p):
            st = state_with_view(st0, combine(p, rest))
            _, _, objectives, metrics = composite.objective(st, metadata, dict(batch))
            return sum(jnp.asarray(v, jnp.float32) for v in objectives.values()), metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, metrics, grads

    loss_f, metrics_f, grads_f = loss_and_grads(fused_agent)
    loss_p, metrics_p, grads_p = loss_and_grads(plain_agent)
    np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_p), rtol=1e-5, atol=1e-6)
    for name in ("ratio", "entropy", "value"):
        np.testing.assert_allclose(
            np.asarray(metrics_f[name]), np.asarray(metrics_p[name]), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )
    # Hook pytrees differ structurally; compare the actor/critic subtrees.
    for part in ("actor", "critic"):
        fa = jax.tree_util.tree_flatten_with_path(grads_f[part])[0]
        pa = jax.tree_util.tree_flatten_with_path(grads_p[part])[0]
        assert len(fa) == len(pa)
        for (path_f, leaf_f), (path_p, leaf_p) in zip(fa, pa):
            assert jax.tree_util.keystr(path_f) == jax.tree_util.keystr(path_p)
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_p), rtol=1e-4, atol=1e-6,
                err_msg=f"{part}{jax.tree_util.keystr(path_f)}",
            )


def test_training_equivalence():
    """Full training loop: fused vs separate suites stay numerically close
    (fp32 on CPU — only op-reassociation noise, amplified by Adam)."""

    def run(agent, env, n=2):
        driver = ScanRolloutDriver(agent, env)
        for _ in range(n):
            driver.collect_and_update(agent.num_steps_per_update)
        jax.block_until_ready(agent.state)
        return np.asarray(agent.state.actor.backbone.layers[0].weight)

    env0, plain = make_agent(fused_ppo_update=False)
    w_plain = run(plain, env0)
    env1, fused = make_agent(fused_ppo_update=True)
    w_fused = run(fused, env1)
    np.testing.assert_allclose(w_fused, w_plain, atol=8e-3, rtol=0)


def test_rejects_recurrent_backbones():
    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=16, action_dim=4, seed=1)
    factory = cusrl_tpu.RecurrentPpoAgentFactory(num_steps_per_update=8, fused_ppo_update=True)
    with pytest.raises(ValueError, match="fusable"):
        factory(env.spec)


def test_rejects_discrete_actor():
    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=16, action_dim=4, seed=1)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=8, fused_ppo_update=True, action_space_type="discrete"
    )
    with pytest.raises(ValueError, match="NormalDist"):
        factory(env.spec)


def test_preset_wires_single_fused_hook():
    _, agent = make_agent(fused_ppo_update=True)
    names = [h.hook_name for h in agent.state.hooks]
    assert "fused_ppo_update" in names
    for absent in ("value_loss", "on_policy_preparation", "ppo_surrogate_loss", "entropy_loss"):
        assert absent not in names
    # Post-update statistics / KL LR control still present and functional.
    find_hook(agent.state.hooks, "on_policy_statistics")
