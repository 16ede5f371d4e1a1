"""Test harness config.

Tests run on a virtual 8-device CPU mesh (multi-chip hardware is not
available in CI; the sharded paths compile and execute against
xla_force_host_platform_device_count per the build mandate) with fp64
enabled. Must run before jax initializes.
"""

import os

# The session environment pre-imports jax and registers the TPU-tunnel
# backend via sitecustomize, so env vars are too late -- use config
# updates. Tests run on a virtual 8-device CPU mesh; the TPU is reserved
# for bench.py.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
