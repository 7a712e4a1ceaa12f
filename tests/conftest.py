"""Test configuration: run JAX on a virtual 8-device CPU mesh.

TPU hardware in CI is a single tunneled chip (remote per-op compiles make
eager tests pathologically slow); multi-chip sharding logic is validated on
virtual CPU devices, and the driver separately dry-runs the real multichip
path.  The axon sitecustomize force-registers the TPU plugin and overrides
JAX_PLATFORMS, so we must re-force CPU via jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
