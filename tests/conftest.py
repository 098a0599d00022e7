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


def _build_native_lib():
    """Build the optional C++ preprocessing library if a toolchain exists
    (the .so is not committed; tests that need it skip when absent)."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lib = os.path.join(root, "native", "libgnn_native.so")
    if os.path.exists(lib) or shutil.which("make") is None \
            or shutil.which("g++") is None:
        return
    subprocess.run(["make", "-C", os.path.join(root, "native")],
                   check=False, capture_output=True)


_build_native_lib()
