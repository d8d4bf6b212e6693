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


def apply_platform_env() -> str | None:
    """Force the jax platform from ``OPEN_PROVENCE_TPU_PLATFORM`` if set.

    Returns the applied platform string, or None when the env var is unset
    (jax keeps its default platform order). Must run before anything
    initializes a jax backend."""
    platform = os.environ.get(ENV_VAR)
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    return platform or None
