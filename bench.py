"""Headline benchmark: PPO throughput on 4096-env locomotion (one TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north star of 10M env-steps/s
on one v5e host (the reference publishes no numbers of its own — SURVEY.md §6).

The headline is the PIPELINED TRAINER loop — the real user-facing training
path (zoo `iterations_per_dispatch` chunking with prefetch before the blocking
metric fetch), measured end-to-end including metric fetches.  BENCH_RAW=1
selects the raw-driver loop (no Trainer, no metric fetch) — the number
reported through round 3 — for A/B continuity.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Must precede the first jax import (the axon plugin snapshots the env at
# init): a 32 MB scoped-VMEM limit measured +2.5% on the RAW loop but ~-1% on
# the trainer headline (benchmarks/tpu_flag_sweep2.sh + same-session recheck,
# v15 ledger), so it defaults on only for BENCH_RAW.  BENCH_VMEM_KIB overrides
# either way (0 disables).
_vmem = os.environ.get("BENCH_VMEM_KIB", "32768" if os.environ.get("BENCH_RAW", "0") == "1" else "0")
if _vmem != "0" and "LIBTPU_INIT_ARGS" not in os.environ:
    os.environ["LIBTPU_INIT_ARGS"] = f"--xla_tpu_scoped_vmem_limit_kib={_vmem}"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR_STEPS_PER_S = 10_000_000.0


def run_trainer_mode(num_envs: int, steps_per_update: int, warmup_iters: int, timed_iters: int) -> None:
    import jax

    from cusrl_tpu.zoo.registry import get_experiment

    spec = get_experiment("Velocity-Rough", "ppo")
    factory = spec.to_training_factory()
    factory.environment_kwargs = {"num_instances": num_envs}
    # Chunk prefetching blurs the warmup/timed boundary by up to one chunk of
    # device work; a longer timed window bounds that to a few percent.
    timed_iters = max(timed_iters, 100)
    factory.num_iterations = 10 * (warmup_iters + timed_iters)
    factory.iterations_per_dispatch = int(os.environ.get("BENCH_CHUNK", factory.iterations_per_dispatch))
    # Same documented TPU perf knobs as the raw-driver bench (BENCH_PARITY=1
    # selects reference-parity defaults for the honesty measurement).
    parity = os.environ.get("BENCH_PARITY", "0") == "1"
    factory.agent.defer_normalization_updates = not parity
    factory.agent.store_original_observations = parity
    factory.agent.fuse_actor_critic_evaluation = os.environ.get("BENCH_FUSE", "1") == "1"
    trainer = factory(verbose=False)

    def run(n):
        for _ in range(n):
            trainer._rollout_and_update_scan()

    def barrier():
        driver = trainer._scan_driver
        jax.block_until_ready(driver._packed if driver._packed is not None else trainer.agent.state)

    run(max(warmup_iters, factory.iterations_per_dispatch))
    barrier()
    start = time.perf_counter()
    run(timed_iters)
    barrier()
    elapsed = time.perf_counter() - start
    steps_per_s = timed_iters * steps_per_update * num_envs / elapsed
    print(
        json.dumps(
            {
                "metric": "ppo_locomotion_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_s / NORTH_STAR_STEPS_PER_S, 4),
            }
        )
    )


def main() -> None:
    import jax

    from cusrl_tpu.utils.config import enable_compilation_cache

    # Persistent executable cache: the first bench invocation of a session pays
    # the multi-minute tunnel compile; later invocations of the same program
    # load from ~/.cache/cusrl_tpu/xla_cache (CUSRL_TPU_COMPILATION_CACHE_DIR
    # overrides; "0" disables).
    enable_compilation_cache()

    # PRNG implementation (BENCH_PRNG=rbg|threefry2x32, default rbg): threefry
    # is the jax default but costs real VPU time per rollout step on TPU; rbg
    # uses the hardware RNG path (measured +0.3M steps/s).  Affects random
    # streams, not statistics quality; learning-parity runs use threefry.
    jax.config.update("jax_default_prng_impl", os.environ.get("BENCH_PRNG", "rbg"))

    import cusrl_tpu
    from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
    from cusrl_tpu.template.rollout import ScanRolloutDriver

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    steps_per_update = int(os.environ.get("BENCH_STEPS", 24))
    warmup_iters = int(os.environ.get("BENCH_WARMUP", 5))
    timed_iters = int(os.environ.get("BENCH_ITERS", 40))
    # BENCH_PARITY=1: reference-parity defaults (no deferred normalization, no
    # original-observation skip) — the "honesty" configuration quoted next to
    # the knobs-on headline in benchmarks/README.md.
    parity = os.environ.get("BENCH_PARITY", "0") == "1"
    # Iterations per jitted dispatch (ScanRolloutDriver.collect_and_update_many;
    # also a Trainer knob).  Amortizes the per-dispatch host overhead.
    chunk = max(1, int(os.environ.get("BENCH_CHUNK", 1)))

    # BENCH_MODE=mlp (headline) | recurrent (GRU backbone, VERDICT r4 item 3) |
    # transformer (windowed-attention backbone).  The driver's plain
    # `python bench.py` invocation stays the MLP trainer-loop headline; the
    # other modes run the raw fused-scan driver and report their own metric.
    mode = os.environ.get("BENCH_MODE", "mlp").lower()

    if mode == "mlp" and os.environ.get("BENCH_RAW", "0") != "1":
        # Headline: the pipelined Trainer loop (the path users actually run).
        run_trainer_mode(num_envs, steps_per_update, warmup_iters, timed_iters)
        return

    env = VelocityLocomotionEnv(num_instances=num_envs)
    metric = "ppo_locomotion_env_steps_per_s"
    if mode == "recurrent":
        metric = "ppo_recurrent_env_steps_per_s"
        factory = cusrl_tpu.RecurrentPpoAgentFactory(
            num_steps_per_update=steps_per_update,
            rnn_type=os.environ.get("BENCH_RNN_TYPE", "gru"),
            rnn_hidden_size=int(os.environ.get("BENCH_RNN_HIDDEN", 64)),
            mlp_hidden_dims=tuple(
                int(d) for d in os.environ.get("BENCH_RNN_MLP", "128").split(",") if d
            ),
            activation_fn="elu",
            sampler_epochs=5,
            sampler_mini_batches=4,
            normalize_observation=True,
            defer_normalization_updates=not parity,
            store_original_observations=parity,
            desired_kl_divergence=0.01,
            # Stacked actor+critic cell evaluation (JointSequentialEvaluation
            # vmap path): doubles rows per BPTT cell matmul.
            fuse_actor_critic_evaluation=os.environ.get("BENCH_FUSE", "0") == "1",
        )
    elif mode == "transformer":
        metric = "ppo_transformer_env_steps_per_s"
        factory = cusrl_tpu.TransformerPpoAgentFactory(
            num_steps_per_update=steps_per_update,
            embed_dim=128,
            num_heads=4,
            attention_window=16,
            mlp_hidden_dims=(128,),
            activation_fn="elu",
            sampler_epochs=5,
            sampler_mini_batches=4,
            normalize_observation=True,
            defer_normalization_updates=not parity,
            store_original_observations=parity,
            desired_kl_divergence=0.01,
            # Pair-kernel joint evaluation (both block chains per Pallas
            # program + one env-concatenated lane pass).
            fuse_actor_critic_evaluation=os.environ.get("BENCH_FUSE", "1") == "1",
        )
    if mode != "mlp":
        agent = factory(env.spec)
        driver = ScanRolloutDriver(agent, env)
        run_raw_loop(driver, agent, metric, num_envs, steps_per_update, warmup_iters, timed_iters, chunk)
        return

    factory = cusrl_tpu.PpoAgentFactory(
        num_steps_per_update=steps_per_update,
        actor_hidden_dims=(512, 256, 128),
        critic_hidden_dims=(512, 256, 128),
        activation_fn="elu",
        sampler_epochs=5,
        sampler_mini_batches=4,
        normalize_observation=True,
        # Documented TPU perf knobs: per-rollout statistics folding (1-iteration
        # lag) and no original_* buffer copies.  BENCH_PARITY=1 turns both off.
        defer_normalization_updates=not parity,
        store_original_observations=parity,
        desired_kl_divergence=0.01,
        # Evaluate actor+critic backbones as one stacked matmul chain in the
        # update (gradient-equivalent; tests/test_joint_eval.py).
        fuse_actor_critic_evaluation=os.environ.get("BENCH_FUSE", "1") == "1",
        # Whole-objective mega-kernel (FusedPpoUpdate).  Default off: measured
        # slower than the pair kernel + XLA tail on v5e (docs/ROADMAP.md).
        fused_ppo_update=os.environ.get("BENCH_FUSED_STEP", "0") == "1",
        # Bootstrap-value pass only over truncated rows.  Default OFF: the
        # 4096-random-row gather measured SLOWER than the full contiguous
        # [T*N] pass it replaces (8.35M vs 8.97M steps/s) — random-row HBM
        # gathers lose to sequential streaming even at 1/24 the rows.
        sparse_value_bootstrap=os.environ.get("BENCH_SPARSE_BOOT", "0") == "1",
    )
    agent = factory(env.spec)
    if len(jax.devices()) > 1:
        from cusrl_tpu.parallel.sharding import distribute_agent

        distribute_agent(agent)
    driver = ScanRolloutDriver(agent, env)
    run_raw_loop(driver, agent, "ppo_locomotion_env_steps_per_s", num_envs, steps_per_update,
                 warmup_iters, timed_iters, chunk)


def run_raw_loop(driver, agent, metric, num_envs, steps_per_update, warmup_iters, timed_iters, chunk):
    """Raw fused-scan loop: jitted dispatches only, one blocking fetch at the
    end of the timed window.  Shared by the MLP BENCH_RAW path and the
    recurrent/transformer BENCH_MODE paths."""
    import jax

    def run_iterations(n: int):
        # Fused jitted dispatches (chunk iterations each); nothing fetched to
        # host.  collect_and_update_many advances agent.iteration itself.
        remaining = n
        while remaining > 0:
            step = min(chunk, remaining)
            driver.collect_and_update_many(steps_per_update, step)
            remaining -= step

    def barrier():
        # Block on the packed carry (reading agent.state would force an
        # unpack dispatch); fall back to the state for the unpacked path.
        jax.block_until_ready(driver._packed if driver._packed is not None else agent.state)

    # Warm both the chunked program and (if the tail needs it) the remainder.
    run_iterations(max(warmup_iters, min(chunk, timed_iters)))
    if timed_iters % chunk:
        run_iterations(timed_iters % chunk)
    barrier()

    start = time.perf_counter()
    run_iterations(timed_iters)
    barrier()
    elapsed = time.perf_counter() - start

    steps_per_s = timed_iters * steps_per_update * num_envs / elapsed
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steps_per_s, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_s / NORTH_STAR_STEPS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
