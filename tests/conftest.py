"""Test configuration: force the CPU backend with 8 virtual devices and
enable float64.

This mirrors the reference's test strategy (SURVEY.md §4): the reference runs
its suite at mpirun -np {1,3}; we run sharding-sensitive tests on a simulated
8-device CPU mesh via --xla_force_host_platform_device_count.

NOTE: the axon TPU plugin ignores the JAX_PLATFORMS environment variable, so
we must force the platform through jax.config before any backend is
initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
