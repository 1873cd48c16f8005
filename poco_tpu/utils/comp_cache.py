"""Persistent XLA compilation cache setup + platform selection.

In the bundled jax version the JAX_COMPILATION_CACHE_DIR environment
variable is NOT read (string config states have no env-var hook —
jax/_src/config.py string_or_object_state), so the cache must be enabled
programmatically. Call `enable_compilation_cache()` before the first
compilation; safe to call multiple times and after jax import.

The same applies to JAX_PLATFORMS: the TPU plugin ignores it, so a
machine without (or with an unreachable) TPU cannot opt out of the
device backend via the standard env var. `POCO_TPU_PLATFORM=cpu` (or
any jax platform name) is honored here, which every CLI entry point
calls before creating arrays.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/root/.cache/jax_comp_cache"


def force_platform_from_env() -> None:
    """Honor POCO_TPU_PLATFORM (e.g. `cpu`) before backend init.

    The bundled TPU plugin ignores the JAX_PLATFORMS env var; this is
    the supported opt-out for hosts where the TPU is absent or its
    tunnel is down (CLIs hang at backend init otherwise).
    """
    plat = os.environ.get("POCO_TPU_PLATFORM")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def enable_compilation_cache(path: str | None = None) -> None:
    force_platform_from_env()
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        # unwritable default (e.g. non-root user): degrade to no cache
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
