"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding (mesh/pjit) is exercised without TPU hardware.

Note: the environment's sitecustomize imports jax at interpreter startup (axon
TPU platform), so env vars alone are too late — use jax.config.update, which
still works because backends initialize lazily at first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
