"""Dump the optimized HLO of the fused transformer iteration and list the
biggest slice/copy/fusion-root tensors (hunting a ~700 MB/iter top-level slice
seen in the round-4 trace)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    num_envs, T = 4096, 24
    env = VelocityLocomotionEnv(num_instances=num_envs)
    factory = cusrl_tpu.TransformerPpoAgentFactory(
        num_steps_per_update=T,
        embed_dim=128, num_heads=4, attention_window=16, mlp_hidden_dims=(128,),
        activation_fn="elu", sampler_epochs=5, sampler_mini_batches=4,
        normalize_observation=True, defer_normalization_updates=True,
        store_original_observations=False, desired_kl_divergence=0.01,
    )
    agent = factory(env.spec)
    driver = ScanRolloutDriver(agent, env)
    driver._ensure_initialized()
    driver._build_packed(T)
    driver._packed = driver._pack_jit(driver._carry_tuple())
    driver._packed_valid = True
    lowered = driver._fused_packed.lower(driver._packed, agent.next_key())
    compiled = lowered.compile()
    txt = compiled.as_text()
    print("HLO chars:", len(txt))

    def nbytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.groups()
        size = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "u8": 1, "s8": 1}.get(dt, 4)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * size

    hits = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(%?[\w.\-]+) = (\w+\[[\d,]*\][^ ]*) (slice|copy|dynamic-slice|concatenate|transpose)\(", ls)
        if m:
            name, shape, op = m.groups()
            b = nbytes(shape)
            if b > 8 * 2**20:
                hits.append((b, op, name, ls[:220]))
    hits.sort(reverse=True)
    for b, op, name, ls in hits[:25]:
        print(f"{b/2**20:9.1f} MB {op:14} {ls[:200]}")


if __name__ == "__main__":
    main()
