"""Capture a jax.profiler trace of the fused bench iteration on the TPU."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import cusrl_tpu
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.template.rollout import ScanRolloutDriver

OUT = os.environ.get("TRACE_DIR", "/tmp/tpu_trace")


def main():
    env = VelocityLocomotionEnv(num_instances=4096)
    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=24,
        actor_hidden_dims=(512, 256, 128),
        critic_hidden_dims=(512, 256, 128),
        activation_fn="elu",
        sampler_epochs=5,
        sampler_mini_batches=4,
        normalize_observation=True,
        defer_normalization_updates=True,
        store_original_observations=False,
        desired_kl_divergence=0.01,
        fuse_actor_critic_evaluation=True,
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)

    def one_iter():
        driver.collect_and_update(24)
        agent.iteration += 1

    for _ in range(4):
        one_iter()
    jax.block_until_ready(driver._packed)

    with jax.profiler.trace(OUT):
        for _ in range(3):
            one_iter()
        jax.block_until_ready(driver._packed)
    t0 = time.perf_counter()
    for _ in range(10):
        one_iter()
    jax.block_until_ready(driver._packed)
    print("steady ms/iter:", (time.perf_counter() - t0) * 100)
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
