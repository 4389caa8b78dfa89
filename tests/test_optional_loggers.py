"""Optional logger backends exercised with FAKE modules (counterpart of
cusrl_test/logger/test_optional_loggers.py, which guards on availability; here
wandb/swanlab are monkeypatched in so `_log_impl` wiring is covered without the
dependencies)."""

import sys
import types

import pytest

from cusrl_tpu.logger import Jsonl, Swanlab, Wandb
from cusrl_tpu.template.logger import make_logger_factory


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, scalars, step=None):
        self.logged.append((dict(scalars), step))

    def finish(self):
        self.finished = True


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.calls = []

    def init(**kwargs):
        mod.calls.append(kwargs)
        mod.run = _FakeRun()
        return mod.run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


@pytest.fixture
def fake_swanlab(monkeypatch):
    mod = types.ModuleType("swanlab")
    mod.calls = []

    def init(**kwargs):
        mod.calls.append(kwargs)
        mod.run = _FakeRun()
        return mod.run

    mod.init = init
    monkeypatch.setitem(sys.modules, "swanlab", mod)
    return mod


def test_wandb_backend_logs_through_run(tmp_path, fake_wandb):
    logger = Wandb(log_dir=str(tmp_path), name="exp", add_timestamp=False)
    assert fake_wandb.calls and fake_wandb.calls[0]["name"] == "exp"
    logger.log_scalars({"reward": 1.0}, iteration=0)
    logger.log_scalars({"reward": 3.0}, iteration=1)
    assert fake_wandb.run.logged == [({"reward": 1.0}, 0), ({"reward": 3.0}, 1)]
    logger.close()
    assert fake_wandb.run.finished


def test_wandb_interval_averaging(tmp_path, fake_wandb):
    logger = Wandb(log_dir=str(tmp_path), name="exp", add_timestamp=False, interval=2)
    logger.log_scalars({"loss": 1.0}, iteration=0)
    assert fake_wandb.run.logged == []  # not at an interval boundary yet
    logger.log_scalars({"loss": 3.0}, iteration=1)
    assert fake_wandb.run.logged == [({"loss": 2.0}, 1)]  # interval mean


def test_swanlab_backend_logs_through_run(tmp_path, fake_swanlab):
    logger = Swanlab(log_dir=str(tmp_path), name="exp", add_timestamp=False)
    assert fake_swanlab.calls and fake_swanlab.calls[0]["experiment_name"] == "exp"
    logger.log_scalars({"entropy": 0.5}, iteration=0)
    assert fake_swanlab.run.logged == [({"entropy": 0.5}, 0)]


def test_factory_resolves_fake_backends(tmp_path, fake_wandb, fake_swanlab):
    for backend, cls in (("wandb", Wandb), ("swanlab", Swanlab), ("jsonl", Jsonl)):
        factory = make_logger_factory(backend, log_dir=str(tmp_path / backend), add_timestamp=False)
        logger = factory("run")
        assert isinstance(logger, cls)
        logger.close()


def test_wandb_import_error_without_module(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)
    with pytest.raises(ImportError, match="wandb"):
        Wandb(log_dir=str(tmp_path), name="exp", add_timestamp=False)


def test_unknown_backend_raises():
    with pytest.raises(ValueError, match="Unknown logger backend"):
        make_logger_factory("nonexistent")("run")
