"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware by forcing the
host platform and splitting it into 8 virtual devices (the same mechanism
the driver uses for the multi-chip dry run).

Note: the TPU plugin in this environment ignores the JAX_PLATFORMS env
var, so we force the platform through jax.config before any test imports
jax arrays.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big-model tests compile once per
# machine, not once per pytest invocation. Must be set programmatically —
# this jax version ignores the JAX_COMPILATION_CACHE_DIR env var.
from poco_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()
