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

# Scrub the TPU activation vars from THIS process's environment so every
# test SUBPROCESS inherits a CPU-only world too (a child left on the TPU
# backend hangs when the dev tunnel is slow and contends with any
# concurrent real-chip process — the tunnel serializes clients).  The
# sitecustomize hook re-registers the TPU from these vars, which is why
# JAX_PLATFORMS alone does not protect children.
for _k in [k for k in os.environ if k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))]:
    os.environ.pop(_k, None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
