"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh; the Pallas kernels
are exercised via the XLA twin backend (identical chunk math) plus
interpret mode, and on real TPU hardware by `bench.py`.

The session's sitecustomize imports jax and pins JAX_PLATFORMS to the
real TPU tunnel before conftest runs, so we must override through
jax.config (env vars are already frozen into jax._src.config).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
