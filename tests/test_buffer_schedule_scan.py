"""Buffer-capacity schedule exercised through the FUSED scan driver (VERDICT
round-1 item 9): a mid-run rollout-length resize changes the jitted update's
[T] dimension — recompile — and must interoperate with the packed carry."""

import jax
import numpy as np

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.hook.on_policy.buffer_schedule import OnPolicyBufferCapacitySchedule
from cusrl_tpu.template.rollout import ScanRolloutDriver


def test_capacity_resize_on_fused_scan_path():
    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=16, observation_dim=12, action_dim=4)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=4,
        actor_hidden_dims=(16,),
        critic_hidden_dims=(16,),
        sampler_epochs=1,
        sampler_mini_batches=1,
        normalize_observation=True,
    ).to_underlying()
    # 4 steps/update for iterations 0-1, then 8 from iteration 2 on.
    factory.register_hook(
        OnPolicyBufferCapacitySchedule(schedule=lambda it: 4 if it < 2 else 8),
        before="value_computation",
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)

    seen_steps = []
    for _ in range(4):
        # Mirror the Trainer's scan path exactly: the fused iteration at the
        # current rollout length, then finish_update (bookkeeping + schedules,
        # which is where the resize fires).
        steps = agent.num_steps_per_update
        seen_steps.append(steps)
        aggregates, stacked, keys = driver.collect_and_update(steps)
        agent.finish_update()
    jax.block_until_ready(stacked)

    assert seen_steps == [4, 4, 8, 8]
    metrics = dict(zip(keys, [float(v) for v in stacked]))
    assert all(np.isfinite(v) for v in metrics.values())
    # The resize forced a repack/recompile; state must still be coherent.
    w = np.asarray(agent.state.actor.backbone.layers[0].weight)
    assert np.isfinite(w).all()
