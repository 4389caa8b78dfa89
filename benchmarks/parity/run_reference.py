"""Runs the torch reference (chengruiz/cusrl at /root/reference) on a gym zoo
experiment and records per-iteration metrics to JSONL.

The reference's optional deps (objprint/tyro/git) are stubbed from
``ref_stubs/`` — run with ``PYTHONPATH=benchmarks/parity/ref_stubs``.

Usage: python run_reference.py <env_name> <seed> <out.jsonl> [num_iterations]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_stubs"))
sys.path.insert(0, "/root/reference")

import cusrl  # noqa: E402
from cusrl.template.logger import Logger, LoggerFactory  # noqa: E402


class CaptureLogger(Logger):
    def __init__(self, out_path: str, **kwargs):
        super().__init__(**kwargs)
        self.out_path = out_path
        self._fh = open(out_path, "w")

    def _log_impl(self, data, iteration):
        self._fh.write(json.dumps({"iteration": int(iteration), **{k: float(v) for k, v in data.items()}}) + "\n")
        self._fh.flush()


def main():
    env_name, seed, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    num_iterations = int(sys.argv[4]) if len(sys.argv) > 4 else None

    cusrl.set_global_seed(seed)
    spec = cusrl.zoo.get_experiment(env_name, "ppo")
    factory = spec.to_training_factory()
    if num_iterations is not None:
        factory.num_iterations = num_iterations

    from cusrl.template import Trainer

    trainer = Trainer(
        environment=factory.make_environment,
        agent_factory=factory.agent_factory,
        logger_factory=lambda: CaptureLogger(
            out_path, log_dir=os.path.join("/tmp/parity_ref_logs", f"{env_name}_{seed}"), name=""
        ),
        num_iterations=factory.num_iterations,
        checkpoint_interval=10 ** 9,
    )
    trainer.run_training_loop()
    print(f"reference run complete: {env_name} seed={seed} -> {out_path}")


if __name__ == "__main__":
    main()
