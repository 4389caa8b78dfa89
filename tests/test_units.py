"""Unit tests mirroring the reference's per-component test coverage:
bijectors, Buffer, optimizer grouping, value bootstrap, gradient clipping,
reward shaping, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.layer.bijector import make_bijector


@pytest.mark.parametrize("spec", ["exp", "exp_0.05_2.0", "softplus", "sigmoid_0.0_2.0", "identity", None])
def test_bijector_forward_inverse_roundtrip(spec):
    bij = make_bijector(spec)
    for value in (0.1, 0.5, 0.9):
        assert bij(bij.inverse(value)) == pytest.approx(value, rel=1e-4)
    x = jnp.asarray([0.2, 0.6])
    np.testing.assert_allclose(np.asarray(bij(bij.inverse(x))), np.asarray(x), rtol=1e-4)


def test_bijector_string_spec_parsing():
    bij = make_bijector("exp_0.05_2.0")
    assert bij.min_value == 0.05 and bij.max_value == 2.0
    with pytest.raises(ValueError):
        make_bijector("nope")


def test_buffer_push_and_wrap():
    from cusrl_tpu.template.buffer import Buffer

    buffer = Buffer(capacity=3, parallelism=2)
    for step in range(4):
        buffer.push({"x": jnp.full((2, 1), float(step)), "nested": {"y": jnp.zeros((2, 2))}})
    assert buffer.full and buffer.cursor == 1
    data = buffer.data
    # Step 3 wrapped into slot 0.
    np.testing.assert_allclose(np.asarray(data["x"])[:, 0, 0], [3.0, 1.0, 2.0])
    assert data["nested"]["y"].shape == (3, 2, 2)


def test_buffer_schema_validation():
    from cusrl_tpu.template.buffer import Buffer

    buffer = Buffer(capacity=2, parallelism=2)
    buffer.push({"x": jnp.zeros((2, 3))})
    with pytest.raises(ValueError):
        buffer.push({"x": {"changed": jnp.zeros((2, 3))}})  # schema change
    with pytest.raises(ValueError):
        buffer.push({"z": jnp.zeros((5, 3))})  # parallelism mismatch


def test_buffer_resize_clears():
    from cusrl_tpu.template.buffer import Buffer

    buffer = Buffer(capacity=2, parallelism=1)
    buffer.push({"x": jnp.zeros((1, 1))})
    buffer.resize(4)
    assert buffer.capacity == 4 and len(buffer) == 0 and buffer.cursor == 0


def test_optimizer_prefix_groups_and_runtime_lr():
    from cusrl_tpu.template.optimizer import AdamFactory, build_optimizer

    params = {
        "actor": {"w": jnp.ones((4, 4))},
        "critic": {"w": jnp.ones((4, 4))},
    }
    factory = AdamFactory(lr=1e-3, param_groups={"critic": {"lr": 1e-2}})
    optimizer = build_optimizer(factory, params)
    assert optimizer.labels_flat["actor.w"] == "default"
    assert optimizer.labels_flat["critic.w"] == "critic"
    assert optimizer.base_learning_rates == {"default": 1e-3, "critic": 1e-2}

    opt_state = optimizer.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    lrs = optimizer.init_learning_rates()
    new_params, _ = optimizer.apply(grads, opt_state, params, lrs)
    # Adam first step ~ lr * sign(grad); critic moved 10x further.
    actor_delta = float(jnp.abs(params["actor"]["w"] - new_params["actor"]["w"]).mean())
    critic_delta = float(jnp.abs(params["critic"]["w"] - new_params["critic"]["w"]).mean())
    assert critic_delta == pytest.approx(10 * actor_delta, rel=1e-3)

    # Runtime LR override: zero LR freezes the group with no rebuild.
    lrs = dict(lrs)
    lrs["critic"] = jnp.zeros(())
    frozen_params, _ = optimizer.apply(grads, opt_state, params, lrs)
    np.testing.assert_array_equal(np.asarray(frozen_params["critic"]["w"]), np.asarray(params["critic"]["w"]))


def test_value_computation_bootstrap_semantics():
    """next_value: shifted values; terminal rows get termination_value; truncated
    rows bootstrap from next_state (reference value.py:58-82 semantics)."""
    from cusrl_tpu.hook.on_policy.value import ValueComputation
    from cusrl_tpu.nn.module.critic import Value
    from cusrl_tpu.nn.module.stub import Identity
    from cusrl_tpu.nn.layer.linear import Linear

    # Critic(x) = sum(x): head weight = ones.
    critic = Value(
        backbone=Identity(input_dim=2),
        head=Linear(weight=jnp.ones((1, 2)), bias=jnp.zeros(1), compute_dtype=None),
    )

    class FakeState:
        pass

    state = FakeState()
    state.critic = critic

    t, n = 3, 2
    obs = jnp.arange(t * n * 2, dtype=jnp.float32).reshape(t, n, 2)
    next_obs = obs + 100.0
    terminated = jnp.zeros((t, n, 1), bool).at[1, 0].set(True)
    truncated = jnp.zeros((t, n, 1), bool).at[1, 1].set(True)
    rollout = {
        "observation": obs,
        "next_observation": next_obs,
        "terminated": terminated,
        "truncated": truncated,
        "done": terminated | truncated,
    }
    hook = ValueComputation(termination_value=0.0, deferred=True)
    _, rollout, _ = hook.pre_update(state, rollout)
    value = np.asarray(rollout["value"])
    next_value = np.asarray(rollout["next_value"])
    expected_value = np.asarray(obs.sum(-1, keepdims=True))
    np.testing.assert_allclose(value, expected_value, atol=1e-5)
    # Regular rows: next_value[t] == value[t+1]
    assert next_value[0, 1, 0] == pytest.approx(value[1, 1, 0])
    # Terminated row -> termination_value
    assert next_value[1, 0, 0] == 0.0
    # Truncated row -> bootstrap critic(next_state)
    assert next_value[1, 1, 0] == pytest.approx(float(next_obs[1, 1].sum()), rel=1e-5)
    # Last row -> bootstrap from next_state
    assert next_value[2, 0, 0] == pytest.approx(float(next_obs[2, 0].sum()), rel=1e-5)


def test_gradient_clipping_groups():
    from cusrl_tpu.hook.on_policy.gradient_clipping import GradientClipping

    hook = GradientClipping.create(max_grad_norm=1.0, groups={"actor": 0.5})
    grads = {"actor": {"w": jnp.full((4,), 3.0)}, "critic": {"w": jnp.full((4,), 3.0)}}
    _, _, clipped, metrics = hook.pre_optim(None, grads)
    actor_norm = float(jnp.linalg.norm(clipped["actor"]["w"]))
    critic_norm = float(jnp.linalg.norm(clipped["critic"]["w"]))
    assert actor_norm == pytest.approx(0.5, rel=1e-4)
    assert critic_norm == pytest.approx(1.0, rel=1e-4)
    assert metrics["grad_norm/actor"] == pytest.approx(6.0, rel=1e-4)


def test_reward_shaping_math():
    from cusrl_tpu.hook.mdp.reward import RewardShaping

    hook = RewardShaping(scale=2.0, shift=1.0, lower_bound=-1.0, upper_bound=3.0)
    transition = {"reward": jnp.asarray([[0.0], [5.0], [-5.0]])}
    _, transition = hook.post_step(None, transition)
    np.testing.assert_allclose(np.asarray(transition["reward"]), [[1.0], [3.0], [-1.0]])


def test_minibatch_sampler_plan_covers_all_indices():
    from cusrl_tpu.sampler import MiniBatchSampler

    sampler = MiniBatchSampler(num_epochs=2, num_mini_batches=4)
    static, meta, idx = sampler.make_plan(jax.random.key(0), 8, 4, {})
    assert idx.shape == (8, 8)  # (E*M, B) with B = 32/4
    for epoch in range(2):
        rows = np.asarray(idx[epoch * 4 : (epoch + 1) * 4]).reshape(-1)
        assert sorted(rows.tolist()) == list(range(32))


def test_epoch_plan_consistency():
    from cusrl_tpu.sampler import MiniBatchSampler, TemporalMiniBatchSampler

    sampler = MiniBatchSampler(num_epochs=3, num_mini_batches=2)
    plan = sampler.make_epoch_plan(jax.random.key(0), 4, 8, {})
    assert plan is not None
    static, perms, batch_size = plan
    assert perms.shape == (3, 32) and batch_size == 16
    assert TemporalMiniBatchSampler(1, 1).make_epoch_plan(jax.random.key(0), 4, 8, {}) is None


def test_temporal_random_sampler_windows():
    from cusrl_tpu.sampler import TemporalRandomSampler

    sampler = TemporalRandomSampler(num_batches=2, batch_size=3, sequence_len=4)
    static, meta, (time_idx, env_idx) = sampler.make_plan(jax.random.key(0), 10, 5, {})
    assert static["temporal"] is True
    assert time_idx.shape == (2, 4, 3) and env_idx.shape == (2, 3)
    rollout = {"x": jnp.arange(10 * 5).reshape(10, 5, 1).astype(jnp.float32)}
    batch = sampler.gather(rollout, (time_idx[0], env_idx[0]))
    assert batch["x"].shape == (4, 3, 1)
    # Windows are consecutive in time.
    col = np.asarray(batch["x"])[:, 0, 0]
    np.testing.assert_allclose(np.diff(col), 5.0)  # stride N per time step
