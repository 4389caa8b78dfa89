"""Shared CLI plumbing (counterpart of cusrl/utils/cli_utils.py:12-112)."""

from __future__ import annotations

import argparse
from typing import Any

from cusrl_tpu.template.trial import Trial
from cusrl_tpu.utils.cli_utils import apply_overrides, split_cli_overrides
from cusrl_tpu.utils.misc import import_module, set_global_seed

__all__ = ["add_common_arguments", "load_trial", "prepare_experiment", "resolve_overrides"]


def add_common_arguments(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("-env", "--environment", required=True, help="Environment name (zoo key prefix)")
    parser.add_argument("-alg", "--algorithm", default="ppo", help="Algorithm name (zoo key suffix)")
    parser.add_argument("--checkpoint", default=None, help="Checkpoint file / iteration / experiment dir")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--log-dir", default="logs")
    parser.add_argument("--name", default=None, help="Override experiment/run name")
    parser.add_argument("-m", "--module", action="append", default=[], help="Extra experiment modules to import")
    parser.add_argument("-s", "--script", action="append", default=[], help="Extra python files to execute")
    parser.add_argument("--inherit-args", action="store_true", help="Replay recorded overrides from the trial metadata")


def prepare_experiment(args: argparse.Namespace):
    from cusrl_tpu.utils.config import configure_distributed
    from cusrl_tpu.zoo.registry import add_experiment_modules, get_experiment

    configure_distributed()
    if args.seed is not None:
        set_global_seed(args.seed)
    for module in args.module:
        add_experiment_modules(module)
    for script in args.script:
        import_module(path=script)
    return get_experiment(args.environment, args.algorithm)


def load_trial(args: argparse.Namespace) -> Trial | None:
    if args.checkpoint is None and not args.inherit_args:
        return None
    try:
        name = args.name or f"{args.environment}_{args.algorithm}"
        return Trial(args.log_dir, name if args.checkpoint is None else None, checkpoint=args.checkpoint)
    except FileNotFoundError:
        if args.checkpoint is not None:
            raise
        return None


def resolve_overrides(factory: Any, overrides: list[str], trial: Trial | None, inherit: bool) -> tuple[Any, dict]:
    recorded: dict[str, Any] = {}
    if inherit and trial is not None:
        for key, raw in trial.load_metadata().get("overrides", {}).items():
            recorded[key] = raw
    merged: list[str] = []
    for key, raw in recorded.items():
        merged.extend([f"--{key}", str(raw)])
    merged.extend(overrides)
    return apply_overrides(factory, merged)
