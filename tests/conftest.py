"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: env vars alone are NOT enough here — the environment may pre-select
a TPU platform via `jax.config.update("jax_platforms", ...)` in a
sitecustomize hook, which overrides JAX_PLATFORMS.  We counter-update the
config after importing jax (but before any backend is initialized).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
