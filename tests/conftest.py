"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform and splitting it into 8 virtual devices (the same mechanism
the driver uses for the multi-chip dry run).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
