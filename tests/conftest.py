"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the session environment may point JAX_PLATFORMS at real TPU
# hardware (e.g. "axon"); tests must never touch it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
