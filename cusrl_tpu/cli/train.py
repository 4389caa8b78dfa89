"""``python -m cusrl_tpu train`` (counterpart of cusrl/cli/train.py:42-58)."""

from __future__ import annotations

import argparse

from cusrl_tpu.cli.common import add_common_arguments, load_trial, prepare_experiment, resolve_overrides
from cusrl_tpu.template.logger import LoggerFactory
from cusrl_tpu.utils.cli_utils import split_cli_overrides

__all__ = ["configure_parser", "main"]


def configure_parser(parser: argparse.ArgumentParser) -> None:
    add_common_arguments(parser)
    parser.add_argument("--logger", default="tensorboard", help="Logger backend (tensorboard/wandb/swanlab/none)")
    parser.add_argument("--num-iterations", type=int, default=None)
    parser.add_argument("--quiet", action="store_true")


def main(args: argparse.Namespace, overrides: list[str]) -> None:
    spec = prepare_experiment(args)
    trial = load_trial(args)
    factory = spec.to_training_factory()
    factory, applied = resolve_overrides(factory, overrides, trial, args.inherit_args)
    if args.num_iterations is not None:
        factory.num_iterations = args.num_iterations

    backend = None if args.logger in (None, "none") else args.logger
    logger_factory = LoggerFactory(backend=backend, log_dir=args.log_dir)
    checkpoint = trial.load_checkpoint() if trial is not None else None
    trainer = factory(
        logger_factory=logger_factory,
        experiment_name=args.name or spec.experiment_name,
        checkpoint=checkpoint,
        metadata={"experiment": spec.experiment_name, "overrides": applied},
        verbose=not args.quiet,
    )
    trainer.run_training_loop()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    configure_parser(parser)
    own, overrides = split_cli_overrides(__import__("sys").argv[1:])
    main(parser.parse_args(own), overrides)
