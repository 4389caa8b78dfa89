"""``python -m cusrl_tpu list-experiments`` (counterpart of
cusrl/cli/list_experiments.py:29)."""

from __future__ import annotations

import argparse

__all__ = ["configure_parser", "main"]


def configure_parser(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("-m", "--module", action="append", default=[], help="Extra experiment modules")


def main(args: argparse.Namespace, overrides: list[str]) -> None:
    from cusrl_tpu.zoo.registry import add_experiment_modules, list_experiments

    for module in args.module:
        add_experiment_modules(module)
    for name in list_experiments():
        print(name)
