"""Test configuration: force a virtual 8-device CPU mesh.

The interpreter boots with the axon TPU plugin already registered (sitecustomize)
and ``JAX_PLATFORMS=axon`` in the environment, captured by jax.config at import
time — so we must override the *config*, not just the env var.  Backend selection
is lazy, so doing this at conftest import (before any test touches a device)
reliably lands every test on a virtual 8-device CPU mesh; the real TPU chip is
reserved for benchmarks.
"""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
