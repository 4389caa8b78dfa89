"""Minimal tyro stub: `tyro.cli(Type, args=(), default=obj)` returns the
default unchanged when no args are given (enough for programmatic zoo use)."""
from . import conf, constructors  # noqa: F401


def cli(cls, *, args=None, default=None, config=None, registry=None, **kwargs):
    if default is not None and not args:
        return default
    if not args:
        return cls()
    raise NotImplementedError("tyro stub cannot parse CLI args")
