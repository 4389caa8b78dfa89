"""Logger backends (counterpart of cusrl/logger/*.py): thin _log_impl subclasses
with import-guarded optional dependencies, discovered by subclass name."""

from __future__ import annotations

from cusrl_tpu.template.logger import Logger

__all__ = ["Jsonl", "Swanlab", "Tensorboard", "Wandb"]


class Jsonl(Logger):
    """Dependency-free file backend: one JSON object per logged iteration in
    ``<log_dir>/metrics.jsonl``.  Used by the learning-parity harness
    (benchmarks/parity/) and anywhere a machine-readable metric stream beats a
    TensorBoard event file."""

    def _setup_backend(self, **kwargs) -> None:
        import os

        self._fh = open(os.path.join(self.log_dir, "metrics.jsonl"), "w")

    def _log_impl(self, scalars, iteration) -> None:
        import json

        record = {"iteration": int(iteration)}
        record.update({key: float(value) for key, value in scalars.items()})
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if hasattr(self, "_fh"):
            self._fh.close()


class Tensorboard(Logger):
    def _setup_backend(self, **kwargs) -> None:
        # Force tensorboard's TF stub: lazily importing real TensorFlow into a
        # process already hosting jax+torch segfaults, and event writing only
        # needs the stub (tensorboard.compat falls back when `notf` imports).
        import sys
        import types

        sys.modules.setdefault("tensorboard.compat.notf", types.ModuleType("tensorboard.compat.notf"))
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as error:  # pragma: no cover
            raise ImportError("tensorboard backend requires torch/tensorboard") from error
        self._writer = SummaryWriter(log_dir=self.log_dir, **kwargs)

    def _log_impl(self, scalars, iteration) -> None:
        for key, value in scalars.items():
            self._writer.add_scalar(key, value, iteration)

    def close(self) -> None:
        if hasattr(self, "_writer"):
            self._writer.close()


class Wandb(Logger):
    def _setup_backend(self, **kwargs) -> None:
        try:
            import wandb
        except ImportError as error:  # pragma: no cover
            raise ImportError("wandb backend requires the 'wandb' package") from error
        self._run = wandb.init(dir=self.log_dir, name=self.name, **kwargs)

    def _log_impl(self, scalars, iteration) -> None:
        self._run.log(scalars, step=iteration)

    def close(self) -> None:
        if hasattr(self, "_run"):
            self._run.finish()


class Swanlab(Logger):
    def _setup_backend(self, **kwargs) -> None:
        try:
            import swanlab
        except ImportError as error:  # pragma: no cover
            raise ImportError("swanlab backend requires the 'swanlab' package") from error
        self._run = swanlab.init(logdir=self.log_dir, experiment_name=self.name, **kwargs)

    def _log_impl(self, scalars, iteration) -> None:
        self._run.log(scalars, step=iteration)
