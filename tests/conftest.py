"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated on
``xla_force_host_platform_device_count=8`` CPU devices, per the driver contract.
Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (overriding the env var); claim it back for CPU-only tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
