"""Trace the RECURRENT (GRU) fused iteration and print the top self-time ops
(parsed locally with tensorboard_plugin_profile — no TensorBoard needed).
Clone of tpu_attention_trace.py at the BENCH_MODE=recurrent config."""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

OUT = os.environ.get("TRACE_DIR", "/tmp/gru_trace")


def main():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    num_envs, T = 4096, 24
    env = VelocityLocomotionEnv(num_instances=num_envs)
    factory = cusrl_tpu.RecurrentPpoAgentFactory(
        num_steps_per_update=T,
        rnn_type="gru",
        rnn_hidden_size=64,
        mlp_hidden_dims=(128,),
        activation_fn="elu",
        sampler_epochs=5,
        sampler_mini_batches=4,
        normalize_observation=True,
        defer_normalization_updates=True,
        store_original_observations=False,
        desired_kl_divergence=0.01,
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)

    def one_iter():
        driver.collect_and_update(T)

    for _ in range(3):
        one_iter()
    jax.block_until_ready(driver._packed)

    with jax.profiler.trace(OUT):
        for _ in range(3):
            one_iter()
        jax.block_until_ready(driver._packed)

    xplanes = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    lines = data.splitlines()
    print(lines[0])
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    key_time = None
    for cand in ("Total self-time (us)", "total_self_time_us", "Total self time (us)", "self_time_us"):
        if rows and cand in rows[0]:
            key_time = cand
            break
    if key_time is None and rows:
        print("columns:", list(rows[0]))
        return
    rows.sort(key=lambda r: float(r.get(key_time, 0) or 0), reverse=True)
    for r in rows[:25]:
        print(json.dumps({k: r.get(k) for k in (list(r)[:2] + [key_time, "Type"]) if k in r}))


if __name__ == "__main__":
    main()
