"""Jax platform selection for CLI entry points.

This environment may preload a TPU plugin whose platform list overrides the
``JAX_PLATFORMS`` env var, so the only reliable way to force a platform is
``jax.config.update`` BEFORE backend initialization. Every CLI calls
:func:`apply_platform_env` first thing; users force CPU (e.g. when the TPU
tunnel is unavailable — device discovery HANGS rather than erroring) with
``OPEN_PROVENCE_TPU_PLATFORM=cpu``.
"""

from __future__ import annotations

import os

ENV_VAR = "OPEN_PROVENCE_TPU_PLATFORM"
CACHE_ENV_VAR = "OPEN_PROVENCE_TPU_COMPILATION_CACHE"
DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache.

    Compiles over the axon TPU tunnel are remote and extremely slow (a
    4-matmul toy program measured 245 s cold); the persistent cache serves the
    same program in <1 s from a fresh process (measured r5). Cache everything:
    min compile time / entry size thresholds are zeroed so even the tiny init
    and bucket programs hit. Disable with OPEN_PROVENCE_TPU_COMPILATION_CACHE=0
    or point it elsewhere by setting it to a path."""
    env = os.environ.get(CACHE_ENV_VAR, "")
    if env == "0":
        return None
    cache_dir = cache_dir or (env if env not in ("", "1") else None) or DEFAULT_CACHE_DIR
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def apply_platform_env() -> str | None:
    """Force the jax platform from ``OPEN_PROVENCE_TPU_PLATFORM`` if set, and
    enable the persistent compilation cache.

    Returns the applied platform string, or None when the env var is unset
    (jax keeps its default platform order). Must run before anything
    initializes a jax backend."""
    platform = os.environ.get(ENV_VAR)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    enable_persistent_compilation_cache()
    return platform or None
