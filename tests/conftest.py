"""Test config: run JAX on CPU with x64 and 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (mirrors the
reference's oversubscribed-mpiexec parallel test strategy,
autotest/framework.py:78-108).

The session environment pins JAX_PLATFORMS=axon (TPU tunnel) and a
sitecustomize registers the axon backend in every interpreter; that path
routes every tiny test jit through remote compilation.  Overriding
``jax_platforms`` via jax.config *before any backend use* forces plain CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
