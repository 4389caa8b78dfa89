"""Training orchestrator (counterpart of cusrl/template/trainer.py:33-416).

Two rollout drivers behind one Trainer API:

* **Host driver** — for :class:`Environment` (Gym adapters, external sims): a
  Python loop around the agent's jitted act/step functions, with partial resets
  of done instances when the env does not autoreset.
* **Scan driver** — for :class:`JaxEnvironment`: policy + env + hooks fuse into
  ONE jitted ``lax.scan`` over the whole rollout; transitions land directly in
  the device-resident buffer with zero per-step dispatch.  This is the TPU
  performance path (the reference's Python act/step loop,
  trainer.py:296-315, has no equivalent cost here).

Episode statistics are aggregated on device (completed-episode return/length
sums per iteration) and folded into a host-side rolling window — the functional
equivalent of the reference's 100-episode EnvironmentStats buffers.
"""

from __future__ import annotations

import json
import time
import os
import subprocess
from collections import deque
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from cusrl_tpu.template.agent import Agent, AgentFactory
from cusrl_tpu.template.environment import Environment, JaxEnvironment, get_done_indices
from cusrl_tpu.template.logger import LoggerFactory
from cusrl_tpu.utils import distributed
from cusrl_tpu.utils.timing import Timer

__all__ = ["EnvironmentStats", "Trainer", "TrainerHook", "save_version_info"]


class EnvironmentStats:
    """Rolling episode reward/length statistics from per-iteration aggregates."""

    def __init__(self, max_episodes: int = 100):
        self.max_episodes = max_episodes
        self._episodes: deque[tuple[float, float, float]] = deque(maxlen=256)  # (count, return_sum, length_sum)
        self.total_steps = 0

    def track_aggregates(self, count: float, return_sum: float, length_sum: float, steps: int) -> None:
        self.total_steps += steps
        if count > 0:
            self._episodes.append((count, return_sum, length_sum))
            while sum(c for c, _, _ in self._episodes) - self._episodes[0][0] >= self.max_episodes:
                self._episodes.popleft()

    @property
    def episode_count(self) -> float:
        return sum(c for c, _, _ in self._episodes)

    @property
    def mean_episode_reward(self) -> float | None:
        count = self.episode_count
        if count == 0:
            return None
        return sum(r for _, r, _ in self._episodes) / count

    @property
    def mean_episode_length(self) -> float | None:
        count = self.episode_count
        if count == 0:
            return None
        return sum(l for _, _, l in self._episodes) / count

    def summary(self, prefix: str = "Environment/") -> dict[str, float]:
        result: dict[str, float] = {}
        if (reward := self.mean_episode_reward) is not None:
            result[f"{prefix}episode_reward"] = reward
        if (length := self.mean_episode_length) is not None:
            result[f"{prefix}episode_length"] = length
        return result

    def state_dict(self) -> dict:
        return {"total_steps": self.total_steps}

    def load_state_dict(self, state: dict) -> None:
        # Deliberately restore only total_steps (trainer.py:106-113).
        self.total_steps = int(state.get("total_steps", 0))


def save_version_info(output_dir: str) -> None:
    """Git provenance snapshot of the working directory (trainer.py:116-140)."""
    os.makedirs(output_dir, exist_ok=True)

    def run(cmd: list[str]) -> str:
        try:
            return subprocess.run(cmd, capture_output=True, text=True, timeout=20).stdout
        except Exception:
            return ""

    with open(os.path.join(output_dir, "workspace.txt"), "w") as f:
        f.write(os.getcwd() + "\n")
    for name, cmd in [
        ("git_log.txt", ["git", "log", "--oneline", "-20"]),
        ("git_status.txt", ["git", "status", "--short"]),
        ("git_diff.patch", ["git", "diff"]),
    ]:
        out = run(cmd)
        if out:
            with open(os.path.join(output_dir, name), "w") as f:
                f.write(out)


class TrainerHook:
    """Side callbacks on the training loop (not agent hooks)."""

    def init(self, trainer: "Trainer") -> None:
        pass

    def pre_iteration(self, trainer: "Trainer") -> None:
        pass

    def post_iteration(self, trainer: "Trainer", metrics: dict[str, float]) -> None:
        pass


class Trainer:
    def __init__(
        self,
        environment: Environment | JaxEnvironment | Callable[[], Any],
        agent_factory: AgentFactory,
        num_iterations: int = 1000,
        logger_factory: LoggerFactory | Callable[..., Any] | None = None,
        checkpoint_interval: int = 50,
        experiment_name: str = "experiment",
        checkpoint: dict[str, Any] | None = None,
        verbose: bool = True,
        hooks: tuple[TrainerHook, ...] = (),
        metadata: dict[str, Any] | None = None,
        profile_dir: str | None = None,
        profile_iterations: tuple[int, int] = (3, 6),
        iterations_per_dispatch: int = 1,
    ):
        self.environment = environment() if callable(environment) and not hasattr(environment, "spec") else environment
        self.agent: Agent = agent_factory.from_environment(self.environment)
        self.num_iterations = num_iterations
        self.checkpoint_interval = checkpoint_interval
        self.verbose = verbose
        self.stats = EnvironmentStats()
        self.timer = Timer(synchronize=True)
        self.hooks = tuple(hooks)
        self.logger = logger_factory(experiment_name) if logger_factory is not None else None
        self.profile_dir = profile_dir
        self.profile_iterations = profile_iterations

        self._is_jax_env = isinstance(self.environment, JaxEnvironment)
        self._scan_driver = None
        self._host_obs = None
        self._host_state = None
        # Multi-iteration fused dispatch (scan driver only): run up to K full
        # training iterations per jitted call and per host transfer.  Chunks
        # never cross a checkpoint boundary, so checkpoints stay consistent
        # with the logged iteration.
        self.iterations_per_dispatch = max(1, int(iterations_per_dispatch))
        self._pending_rows: list[np.ndarray] = []
        self._pending_keys: tuple[str, ...] = ()
        self._inflight_chunk = None
        self._last_chunk_done: float | None = None

        if checkpoint is not None:
            self.load_checkpoint(checkpoint)
        if self.logger is not None and distributed.is_main_process():
            save_version_info(self.logger.info_dir)
            with open(os.path.join(self.logger.info_dir, "metadata.json"), "w") as f:
                json.dump(metadata or {}, f, indent=2, default=str)
            self._save_agent_info()
        for hook in self.hooks:
            hook.init(self)

    def _save_agent_info(self) -> None:
        """Structure dump of the agent (objprint equivalent, trainer.py:361):
        hook pipeline, parameter shapes/counts, environment spec."""
        try:
            from cusrl_tpu.nn.base import tree_paths

            lines = [f"agent: {type(self.agent).__name__}", f"spec: {self.agent.environment_spec}", ""]
            if hasattr(self.agent, "state"):
                lines.append("hooks:")
                for hook in self.agent.state.hooks:
                    lines.append(f"  - {hook.hook_name}: {type(hook).__name__}(active={hook.active})")
                lines.append("")
                lines.append("parameters:")
                total = 0
                for path, leaf in tree_paths(self.agent.state):
                    if hasattr(leaf, "shape") and path.startswith(("actor", "critic", "hooks")):
                        size = int(np.prod(leaf.shape)) if leaf.shape else 1
                        total += size
                        lines.append(f"  {path}: {tuple(leaf.shape)}")
                lines.append(f"total_parameters: {total}")
            with open(os.path.join(self.logger.info_dir, "agent_info.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
        except Exception:
            pass

    # -- checkpointing ---------------------------------------------------------

    def make_checkpoint(self) -> dict[str, Any]:
        return {
            "agent": self.agent.state_dict(),
            "environment": self.environment.state_dict(),
            "stats": self.stats.state_dict(),
            "iteration": self.agent.iteration,
        }

    def load_checkpoint(self, checkpoint: dict[str, Any]) -> None:
        self.agent.load_state_dict(checkpoint.get("agent", {}))
        if checkpoint.get("environment"):
            self.environment.load_state_dict(checkpoint["environment"])
        if checkpoint.get("stats"):
            self.stats.load_state_dict(checkpoint["stats"])
        if "iteration" in checkpoint:
            self.agent.set_iteration(int(checkpoint["iteration"]))

    # -- main loop -------------------------------------------------------------

    def run_training_loop(self) -> None:
        start = self.agent.iteration
        for iteration in range(start, self.num_iterations):
            # Optional device tracing (SURVEY §5): capture a window of
            # iterations with jax.profiler for TensorBoard's trace viewer.
            if self.profile_dir is not None and iteration == self.profile_iterations[0]:
                jax.profiler.start_trace(self.profile_dir)
            for hook in self.hooks:
                hook.pre_iteration(self)
            metrics = self._rollout_and_update()
            if self.profile_dir is not None and iteration + 1 == self.profile_iterations[1]:
                jax.block_until_ready(self.agent.state)
                jax.profiler.stop_trace()
            metrics = self._log_iteration(iteration, metrics)
            for hook in self.hooks:
                hook.post_iteration(self, metrics)
            if self.logger is not None and (iteration + 1) % self.checkpoint_interval == 0:
                self.logger.save_checkpoint(self.make_checkpoint(), iteration + 1)
        if self.logger is not None:
            self.logger.save_checkpoint(self.make_checkpoint(), self.num_iterations)

    def _rollout_and_update(self) -> dict[str, float]:
        if self._is_jax_env:
            return self._rollout_and_update_scan()
        return self._rollout_and_update_host()

    # -- host driver -----------------------------------------------------------

    def _rollout_and_update_host(self) -> dict[str, float]:
        env = self.environment
        agent = self.agent
        if self._host_obs is None:
            self._host_obs, self._host_state, _ = env.reset()
            self._host_cum_reward = np.zeros(env.num_instances)
            self._host_cum_length = np.zeros(env.num_instances)

        with self.timer.record("environment"):
            should_update = False
            while not should_update:
                action = agent.act(self._host_obs, self._host_state)
                obs, state, reward, terminated, truncated, info = env.step(action)
                done = np.asarray(terminated).reshape(-1) | np.asarray(truncated).reshape(-1)
                self._host_cum_reward += np.asarray(reward).sum(-1)
                self._host_cum_length += 1
                if done.any():
                    self.stats.track_aggregates(
                        float(done.sum()),
                        float(self._host_cum_reward[done].sum()),
                        float(self._host_cum_length[done].sum()),
                        0,
                    )
                    self._host_cum_reward[done] = 0
                    self._host_cum_length[done] = 0
                self.stats.total_steps += env.num_instances
                extra = {k: v for k, v in (info or {}).items() if isinstance(v, np.ndarray)}
                should_update = agent.step(obs, reward, terminated, truncated, next_state=state, **extra)
                if not env.spec.autoreset:
                    indices = get_done_indices(terminated, truncated)
                    if indices.size:
                        new_obs, new_state, _ = env.reset(indices=indices)
                        obs = np.asarray(obs).copy()
                        obs[indices] = np.asarray(new_obs)[indices]
                        if state is not None and new_state is not None:
                            state = np.asarray(state).copy()
                            state[indices] = np.asarray(new_state)[indices]
                self._host_obs, self._host_state = obs, state

        with self.timer.record("agent"):
            return self.agent.update()

    # -- scan driver -----------------------------------------------------------

    def _rollout_and_update_scan(self) -> dict[str, float]:
        from cusrl_tpu.template.rollout import ScanRolloutDriver

        if self._scan_driver is None:
            self._scan_driver = ScanRolloutDriver(self.agent, self.environment)

        if self.iterations_per_dispatch > 1:
            return self._rollout_and_update_scan_chunked()

        with self.timer.record("agent"):
            aggregates, stacked, keys = self._scan_driver.collect_and_update(self.agent.num_steps_per_update)
            # ONE host transfer per iteration: stats aggregates + all metrics.
            values = np.asarray(jnp.concatenate([aggregates, stacked]))
        count, return_sum, length_sum = (float(x) for x in values[:3])
        steps = self.agent.num_steps_per_update * self.environment.num_instances * distributed.world_size()
        self.stats.track_aggregates(count, return_sum, length_sum, steps)
        self.agent.step_index = self.agent.num_steps_per_update
        self.agent.record(dict(zip(keys, values[3:])))
        return self.agent.finish_update()

    def _dispatch_chunk(self):
        """Queues one fused multi-iteration dispatch (async); returns device
        values + metadata.  Chunks clamp to checkpoint boundaries and the end
        of training."""
        logical = self.agent.iteration
        boundary = self.checkpoint_interval - (logical % self.checkpoint_interval)
        chunk = max(1, min(self.iterations_per_dispatch, self.num_iterations - logical, boundary))
        aggregates, stacked, keys = self._scan_driver.collect_and_update_many(
            self.agent.num_steps_per_update, chunk
        )
        values_dev = jnp.concatenate([jnp.asarray(aggregates, jnp.float32), stacked], axis=1)
        return values_dev, keys, chunk, logical + chunk

    def _rollout_and_update_scan_chunked(self) -> dict[str, float]:
        """K iterations per jitted dispatch + host transfer.  Each call still
        returns ONE iteration's metrics (the run loop's cadence is unchanged);
        device work and transfers happen on the first call of each chunk."""
        if not self._pending_rows:
            start = time.perf_counter()
            inflight = self._inflight_chunk or self._dispatch_chunk()
            self._inflight_chunk = None
            values_dev, keys, chunk, end = inflight
            # Pipeline: dispatch the NEXT chunk before blocking on this one's
            # transfer — over the axon tunnel the blocking fetch costs a ~25 ms
            # round trip that would otherwise serialize chunks (measured: 7.25M
            # vs 9.0M steps/s un-pipelined).  Never prefetch across a
            # checkpoint boundary or the end of training: agent.state reads at
            # those points must not observe future iterations.
            if end % self.checkpoint_interval != 0 and end < self.num_iterations:
                self._inflight_chunk = self._dispatch_chunk()
            values = np.asarray(values_dev)
            # Amortize wall time over the chunk's iterations so Perf/* metrics
            # stay per-iteration meaningful; in the pipelined steady state the
            # span between refills is the true per-chunk cost.
            now = time.perf_counter()
            if self._last_chunk_done is not None:
                self._chunk_iter_time = (now - self._last_chunk_done) / chunk
            else:
                self._chunk_iter_time = (now - start) / chunk
            self._last_chunk_done = now
            self._pending_rows = [values[i] for i in range(values.shape[0])]
            self._pending_keys = keys
        self.timer.add("agent", self._chunk_iter_time)
        row = self._pending_rows.pop(0)
        count, return_sum, length_sum = (float(x) for x in row[:3])
        steps = self.agent.num_steps_per_update * self.environment.num_instances * distributed.world_size()
        self.stats.track_aggregates(count, return_sum, length_sum, steps)
        # collect_and_update_many already advanced agent.iteration and applied
        # schedules; only summarize this iteration's metrics here.
        self.agent.step_index = 0
        self.agent.record(dict(zip(self._pending_keys, row[3:])))
        summary = self.agent.metrics.summary()
        self.agent.metrics.clear()
        return summary

    # -- logging ---------------------------------------------------------------

    def _log_iteration(self, iteration: int, metrics: dict[str, float]) -> dict[str, float]:
        env_time = self.timer.total("environment")
        agent_time = self.timer.total("agent")
        self.timer.clear()
        steps = self.agent.num_steps_per_update * getattr(self.environment, "num_instances", 1)
        steps *= distributed.world_size()
        info = {f"Train/{k}": v for k, v in metrics.items()}
        info.update(self.stats.summary())
        # Simulator-reported metrics (IsaacLab/mjlab extras["log"] parity).
        get_metrics = getattr(self.environment, "get_metrics", None)
        if get_metrics is not None:
            info.update({f"Environment/{k}": v for k, v in get_metrics().items()})
        info.update(
            {
                "Perf/environment_time": env_time,
                "Perf/agent_time": agent_time,
                "Perf/environment_step": float(self.stats.total_steps),
                "Perf/environment_fps": steps / env_time if env_time > 0 else 0.0,
                "Perf/agent_fps": steps / agent_time if agent_time > 0 else 0.0,
                "Perf/total_fps": steps / (env_time + agent_time) if env_time + agent_time > 0 else 0.0,
            }
        )
        info = distributed.average_dict(info)
        if self.logger is not None:
            self.logger.log_scalars(info, iteration)
        if self.verbose and distributed.is_main_process():
            reward = info.get("Environment/episode_reward")
            reward_str = f"{reward:9.3f}" if reward is not None else "      n/a"
            print(
                f"iter {iteration + 1:>5}/{self.num_iterations} | reward {reward_str} | "
                f"env_fps {info['Perf/environment_fps']:>12.0f} | agent_fps {info['Perf/agent_fps']:>12.0f}"
            )
        return info
