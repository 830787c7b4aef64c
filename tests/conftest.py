"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated on
8 virtual CPU devices (the driver separately dry-runs the multi-chip path).

The session environment registers a tunneled TPU backend (axon) in every
interpreter via sitecustomize and pins JAX_PLATFORMS=axon; unit tests must NOT
run over that tunnel (remote compiles make each jit take ~minutes), so we
force the platform back to CPU in-process before any backend initialises.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
