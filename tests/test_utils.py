import math

import pytest

from cusrl_tpu.utils import nest
from cusrl_tpu.utils.dict_utils import from_dict, get_first, prefix_dict_keys, to_dict
from cusrl_tpu.utils.scheduler import (
    CosineAnnealingScheduler,
    LessThan,
    NotLessThan,
    PiecewiseLinearScheduler,
    StepScheduler,
    TanhScheduler,
)


def test_nest_roundtrip():
    data = {"a": {"b": 1, "c": [2, 3]}, "d": 4}
    schema = nest.get_schema(data)
    flat = nest.flatten_nested(data)
    assert flat == {"a.b": 1, "a.c.0": 2, "a.c.1": 3, "d": 4}
    rebuilt = nest.reconstruct_nested(flat, schema)
    assert rebuilt == data


def test_nest_map_and_zip():
    data = {"x": 1, "y": (2, 3)}
    doubled = nest.map_nested(lambda v: v * 2, data)
    assert doubled == {"x": 2, "y": (4, 6)}
    zipped = nest.zip_nested(data, doubled)
    assert zipped == {"x": (1, 2), "y": ((2, 4), (3, 6))}


def test_step_scheduler():
    s = StepScheduler(1.0, (10, 2.0), (20, 3.0))
    assert s(0) == 1.0 and s(10) == 2.0 and s(19) == 2.0 and s(25) == 3.0
    with pytest.raises(ValueError):
        StepScheduler(1.0, (10, 2.0), (5, 3.0))


def test_piecewise_linear_scheduler():
    s = PiecewiseLinearScheduler((0, 0.0), (10, 1.0))
    assert s(-5) == 0.0 and s(5) == pytest.approx(0.5) and s(20) == 1.0


def test_cosine_scheduler():
    s = CosineAnnealingScheduler((0, 1.0), (10, 0.0))
    assert s(0) == 1.0 and s(10) == 0.0 and s(5) == pytest.approx(0.5)


def test_tanh_scheduler_monotone():
    s = TanhScheduler((0, 0.0), (10, 1.0), eta=2.0)
    values = [s(i) for i in range(11)]
    assert values[0] == 0.0 and values[-1] == 1.0
    assert all(b >= a for a, b in zip(values, values[1:]))


def test_threshold_predicates():
    assert LessThan(5)(4) and not LessThan(5)(5)
    assert NotLessThan(5)(5) and not NotLessThan(5)(4)


def test_dict_utils_roundtrip():
    import dataclasses

    @dataclasses.dataclass
    class Inner:
        x: int = 1

    @dataclasses.dataclass
    class Outer:
        inner: Inner
        name: str = "n"

    # Classes defined locally are not importable; use module-level classes instead.
    from cusrl_tpu.preset.ppo import PpoAgentFactory

    factory = PpoAgentFactory(lr=1e-3, sampler_epochs=7)
    data = to_dict(factory)
    assert data["lr"] == 1e-3
    rebuilt = from_dict(data)
    assert isinstance(rebuilt, PpoAgentFactory)
    assert rebuilt.sampler_epochs == 7 and rebuilt.lr == 1e-3


def test_dict_utils_override_template():
    from cusrl_tpu.preset.ppo import PpoAgentFactory

    template = PpoAgentFactory()
    overridden = from_dict({"lr": 5e-4, "sampler_epochs": 3}, template)
    assert overridden.lr == 5e-4 and overridden.sampler_epochs == 3
    assert template.lr != 5e-4  # immutable-ish: template untouched


def test_get_first_and_prefix():
    assert get_first({"a": 1, "b": 2}, "b", "a") == 2
    assert get_first({}, "x", default=None) is None
    with pytest.raises(KeyError):
        get_first({}, "x")
    assert prefix_dict_keys({"a": 1}, "p/") == {"p/a": 1}


def test_metrics_accumulation():
    from cusrl_tpu.utils.metrics import Metrics

    m = Metrics()
    m.record(loss=1.0)
    m.record(loss=[2.0, 3.0])
    summary = m.summary("Train")
    assert summary["Train/loss"] == pytest.approx(2.0)
    m.clear()
    assert m.summary() == {}
