"""Persistent XLA compilation cache setup.

In the bundled jax version the JAX_COMPILATION_CACHE_DIR environment
variable is NOT read (string config states have no env-var hook —
jax/_src/config.py string_or_object_state), so the cache must be enabled
programmatically. Call `enable_compilation_cache()` before the first
compilation; safe to call multiple times and after jax import.
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/root/.cache/jax_comp_cache"


def enable_compilation_cache(path: str | None = None) -> None:
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
