"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's only radio-free entry point (m17_test.cpp): all
tests are digital, no SDR hardware.  Multi-device sharding tests use the
8 virtual CPU devices.  The environment's TPU plugin ignores the
JAX_PLATFORMS env var, so the platform is forced via jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
