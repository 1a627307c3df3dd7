"""Test env: force an 8-virtual-device CPU platform.

This is the JAX-native "fake backend" for multi-chip tests (SURVEY.md §4):
sharding/collective code paths compile and execute on 8 host devices without
TPU hardware.  Must run before the first jax backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
