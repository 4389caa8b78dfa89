"""``python -m cusrl_tpu benchmark`` (counterpart of cusrl/cli/benchmark.py:42-56):
an evaluation loop with no real-time pacing reporting mean step/episode rewards."""

from __future__ import annotations

import argparse

from cusrl_tpu.cli.common import add_common_arguments, load_trial, prepare_experiment, resolve_overrides

__all__ = ["configure_parser", "main"]


def configure_parser(parser: argparse.ArgumentParser) -> None:
    add_common_arguments(parser)
    parser.add_argument("--num-steps", type=int, default=1000)


def main(args: argparse.Namespace, overrides: list[str]) -> None:
    spec = prepare_experiment(args)
    trial = load_trial(args)
    factory = spec.to_benchmarking_factory()
    factory, _ = resolve_overrides(factory, overrides, trial, args.inherit_args)
    factory.num_steps = args.num_steps
    checkpoint = trial.load_checkpoint() if trial is not None else None
    player = factory(checkpoint=checkpoint, verbose=True)
    player.run_playing_loop()
