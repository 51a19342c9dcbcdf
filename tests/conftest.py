"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the session environment may point JAX_PLATFORMS at real TPU
# hardware (e.g. "axon"); tests must never touch it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may have already registered a hardware
# backend AND called jax.config.update("jax_platforms", "axon,cpu"), which
# overrides the env var above.  Re-point the config at cpu before any
# backend is instantiated (backends are created lazily at first
# jax.devices(), so doing this at conftest import time is early enough).
import jax

jax.config.update("jax_platforms", "cpu")
