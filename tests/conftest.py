"""Test configuration: force an 8-device virtual CPU mesh.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform must
be pinned via jax.config before any computation.  Tests exercise sharding
logic on 8 virtual CPU devices (`XLA_FLAGS=--xla_force_host_platform_device_count=8`).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
