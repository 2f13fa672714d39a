"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-device sharding is exercised
on a virtual CPU mesh (the TPU substitute for multi-chip tests).
This must run before jax is imported anywhere.

NOTE: in this environment the axon TPU plugin overrides JAX_PLATFORMS,
so JAX_PLATFORM_NAME (which wins) is set too.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
