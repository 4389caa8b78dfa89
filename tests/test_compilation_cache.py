"""Persistent XLA compilation-cache wiring (VERDICT r4 item 4).

Counterpart of the reference's per-rank compiler cache dirs
(cusrl/utils/config.py:121-146): JAX's content-addressed persistent cache,
wired before the first jit by every entry point (CLI dispatcher, bench.py,
dryrun).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cusrl_tpu.utils.config import enable_compilation_cache


def _restore(prev_dir, prev_secs, prev_bytes):
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_bytes)


def test_enable_sets_config_and_creates_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("CUSRL_TPU_CACHE_CPU", "1")
    prev = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )
    monkeypatch.delenv("CUSRL_TPU_COMPILATION_CACHE_DIR", raising=False)
    target = str(tmp_path / "xla_cache")
    try:
        used = enable_compilation_cache(target)
        assert used == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        _restore(*prev)


def test_env_var_overrides_and_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("CUSRL_TPU_CACHE_CPU", "1")
    prev = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )
    try:
        override = str(tmp_path / "override")
        monkeypatch.setenv("CUSRL_TPU_COMPILATION_CACHE_DIR", override)
        assert enable_compilation_cache(str(tmp_path / "ignored")) == override
        assert jax.config.jax_compilation_cache_dir == override

        monkeypatch.setenv("CUSRL_TPU_COMPILATION_CACHE_DIR", "0")
        assert enable_compilation_cache() is None
    finally:
        _restore(*prev)


def test_cache_file_written_on_compile(tmp_path, monkeypatch):
    """End-to-end: a jitted program actually lands in the cache directory."""
    prev = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )
    monkeypatch.delenv("CUSRL_TPU_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("CUSRL_TPU_CACHE_CPU", "1")
    monkeypatch.setenv("CUSRL_TPU_CACHE_MIN_COMPILE_SECS", "0")
    target = str(tmp_path / "xla_cache")
    try:
        enable_compilation_cache(target)

        # A program unique to this test so the write is attributable.
        @jax.jit
        def fn(x):
            return jnp.tanh(x * 3.25) + 41.17

        fn(jnp.arange(8.0)).block_until_ready()
        assert os.listdir(target), "no cache entry written by a compiled program"
    finally:
        _restore(*prev)


def test_cli_entry_wires_cache_before_first_jit(monkeypatch, tmp_path):
    """Importing the CLI dispatcher (the path every subcommand goes through)
    must leave the cache configured — i.e. it lands before any jit runs."""
    prev = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )
    target = str(tmp_path / "cli_cache")
    monkeypatch.setenv("CUSRL_TPU_COMPILATION_CACHE_DIR", target)
    monkeypatch.setenv("CUSRL_TPU_CACHE_CPU", "1")
    try:
        import importlib

        import cusrl_tpu.__main__ as cli_main

        importlib.reload(cli_main)
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        _restore(*prev)


def test_cpu_backend_skips_cache_by_default(tmp_path, monkeypatch):
    """XLA:CPU AOT cache entries are machine-feature pinned (SIGILL risk when
    loaded under a different snapshot): CPU backends skip the cache unless
    CUSRL_TPU_CACHE_CPU=1."""
    prev = (
        jax.config.jax_compilation_cache_dir,
        jax.config.jax_persistent_cache_min_compile_time_secs,
        jax.config.jax_persistent_cache_min_entry_size_bytes,
    )
    monkeypatch.delenv("CUSRL_TPU_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("CUSRL_TPU_CACHE_CPU", raising=False)
    try:
        assert enable_compilation_cache(str(tmp_path / "nope")) is None
        assert not (tmp_path / "nope").exists()
    finally:
        _restore(*prev)
