"""CLI dispatcher (counterpart of cusrl/__main__.py:7-56).

Subcommands: train, play, benchmark, export, find-trial, list-experiments.
Factory-tree overrides follow a ``--`` separator, e.g.::

    python -m cusrl_tpu train -env Velocity-Flat -alg ppo -- --agent.lr 1e-4
"""

from __future__ import annotations

import argparse
import os
import sys

# Honor JAX_PLATFORMS even when a platform plugin (e.g. a remote-TPU tunnel)
# was registered at interpreter boot and captured the config before the env
# var could take effect.  `JAX_PLATFORMS=cpu python -m cusrl_tpu ...` must
# reliably keep host-loop training off a shared accelerator.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from cusrl_tpu.cli import benchmark, export, find_trial, list_experiments, play, train
from cusrl_tpu.utils.cli_utils import split_cli_overrides
from cusrl_tpu.utils.config import enable_compilation_cache

# Persistent XLA compilation cache (reference keeps per-rank compiler cache
# dirs, cusrl/utils/config.py:121-146).  Must land before the first jit —
# module import time is the earliest point every subcommand passes through.
enable_compilation_cache()

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
