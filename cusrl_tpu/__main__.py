"""CLI dispatcher (counterpart of cusrl/__main__.py:7-56).

Subcommands: train, play, benchmark, export, find-trial, list-experiments.
Factory-tree overrides follow a ``--`` separator, e.g.::

    python -m cusrl_tpu train -env Velocity-Flat -alg ppo -- --agent.lr 1e-4
"""

from __future__ import annotations

import argparse
import sys

from cusrl_tpu.cli import benchmark, export, find_trial, list_experiments, play, train
from cusrl_tpu.utils.cli_utils import split_cli_overrides

_COMMANDS = {
    "train": train,
    "play": play,
    "benchmark": benchmark,
    "export": export,
    "find-trial": find_trial,
    "list-experiments": list_experiments,
}


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    own, overrides = split_cli_overrides(argv)

    parser = argparse.ArgumentParser(prog="cusrl_tpu", description=__doc__)
    subparsers = parser.add_subparsers(dest="command", required=True)
    for name, module in _COMMANDS.items():
        sub = subparsers.add_parser(name)
        module.configure_parser(sub)
    args = parser.parse_args(own)
    _COMMANDS[args.command].main(args, overrides)


if __name__ == "__main__":
    main()
