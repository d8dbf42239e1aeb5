"""Persistent XLA compilation cache.

The e2e lego run spends ~7 min compiling on a cold process and ~0.45 s/frame
after (VERDICT round 1); the reference has no such cost because Taichi caches
its CUDA kernels on disk (~/.cache/ti). This is the JAX analogue: every entry
point calls enable_compilation_cache() so the second invocation of any app
skips straight to execution.

Opt out with GSMPM_NO_COMPILATION_CACHE=1 or pick a directory with
GSMPM_COMPILATION_CACHE_DIR (default ~/.cache/gsmpm_tpu/xla).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache (idempotent).

    Returns the cache directory, or None when disabled via environment.
    """
    global _ENABLED
    if os.environ.get("GSMPM_NO_COMPILATION_CACHE"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get(
            "GSMPM_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "gsmpm_tpu", "xla"
            ),
        )
    if _ENABLED:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, even fast compiles: the apps dispatch many small
    # jitted helpers whose compiles add up across a cold start
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _ENABLED = True
    return cache_dir
