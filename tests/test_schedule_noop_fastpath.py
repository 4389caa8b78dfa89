"""The schedule_is_noop fast path (template/hook.py + actor_critic.py): it
guards the packed-carry synchronization, so a hook whose schedule_is_noop lies
(returns True while apply_schedule changes state) would silently skip its
schedule on the scan path.  These tests pin the contract and the fast path."""

import jax
import numpy as np

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.nn.base import mutable_field, static_field
from cusrl_tpu.template.hook import Hook
from cusrl_tpu.template.rollout import ScanRolloutDriver


class CountingScheduleHook(Hook):
    """Fires its schedule on even iterations only."""

    fire_below: int = static_field(default=100)
    applied_count: int = static_field(default=0)

    def apply_schedule(self, iteration: int, agent=None):
        if iteration >= self.fire_below:
            return self
        return self.replace(applied_count=self.applied_count + 1)

    def schedule_is_noop(self, iteration: int) -> bool:
        return iteration >= self.fire_below


class NoopHook(Hook):
    pass


def test_default_schedule_is_noop_reflects_override():
    assert NoopHook().schedule_is_noop(0) is True
    assert CountingScheduleHook().schedule_is_noop(0) is False
    assert CountingScheduleHook().schedule_is_noop(100) is True


def test_schedules_fire_through_packed_scan_path():
    """On the packed fused driver, schedules must still run every iteration
    while active and stop syncing once all are no-ops."""
    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=12, action_dim=4)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=4, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1,
    ).to_underlying()
    factory.register_hook(CountingScheduleHook(fire_below=3), before="value_computation")
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)

    for _ in range(5):
        driver.collect_and_update(agent.num_steps_per_update)
        agent.finish_update()

    hook = next(h for h in agent.state.hooks if isinstance(h, CountingScheduleHook))
    # Construction applies schedules at iteration 0, then finish_update applies
    # at iterations 1..5; fire_below=3 -> applied at 0, 1, 2 = 3 times.
    assert hook.applied_count == 3


def test_lr_warmup_schedule_applies_on_scan_path():
    """AdaptiveLRSchedule's warmup is driven by apply_schedule; the warmup
    scale must actually reach the packed carry."""
    cusrl_tpu.set_global_seed(0)
    env = VelocityLocomotionEnv(num_instances=8, observation_dim=12, action_dim=4)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=4, actor_hidden_dims=(16,), critic_hidden_dims=(16,),
        sampler_epochs=1, sampler_mini_batches=1,
        desired_kl_divergence=0.01,
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)
    for _ in range(3):
        driver.collect_and_update(agent.num_steps_per_update)
        agent.finish_update()
    hook = next(h for h in agent.state.hooks if hasattr(h, "lr_scale"))
    assert np.isfinite(float(np.asarray(hook.lr_scale)))
