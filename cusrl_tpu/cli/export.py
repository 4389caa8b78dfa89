"""``python -m cusrl_tpu export`` (counterpart of cusrl/cli/export.py:54-88)."""

from __future__ import annotations

import argparse

from cusrl_tpu.cli.common import add_common_arguments, load_trial, prepare_experiment, resolve_overrides

__all__ = ["configure_parser", "main"]


def configure_parser(parser: argparse.ArgumentParser) -> None:
    add_common_arguments(parser)
    parser.add_argument("--output", "-o", required=True, help="Output directory")
    parser.add_argument(
        "--format", default="stablehlo", choices=["stablehlo", "savedmodel", "tflite", "package"]
    )
    parser.add_argument("--batch-size", type=int, default=1)


def main(args: argparse.Namespace, overrides: list[str]) -> None:
    spec = prepare_experiment(args)
    trial = load_trial(args)
    factory = spec.to_playing_factory()
    factory, _ = resolve_overrides(factory, overrides, trial, args.inherit_args)
    environment = factory.environment_factory(**factory.environment_kwargs)
    agent = factory.agent.from_environment(environment)
    if trial is not None and (checkpoint := trial.load_checkpoint()) is not None:
        agent.load_state_dict(checkpoint.get("agent", checkpoint))
    agent.export(args.output, target_format=args.format, batch_size=args.batch_size)
