"""Test harness: force the CPU backend with 8 virtual devices.

Distributed tests validate sharding semantics on a virtual CPU mesh
(SURVEY.md §4) — no TPU needed.  The environment pins JAX_PLATFORMS=axon, so
the platform must be overridden via jax.config before first use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
flags = os.environ["XLA_FLAGS"]
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
