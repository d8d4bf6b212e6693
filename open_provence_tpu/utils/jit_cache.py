"""Process-wide cache for jitted forward programs.

The engine/encoder wrap ``module.apply`` in closures, so a plain
``jax.jit`` cache keys on the closure object — every model INSTANCE used to
recompile programs that are byte-identical for the same architecture. Flax
modules hash structurally (our config dataclasses are ``unsafe_hash=True``),
so keying one process-wide table on ``(tag, module, …)`` lets every instance
with the same architecture share compiled programs: reloading a checkpoint,
constructing several engines in one server, or the test suite's dozens of
tiny models all hit the same executable. (No reference counterpart — the
torch reference has no compile step.)
"""

from __future__ import annotations

from typing import Any, Callable

_SHARED: dict[Any, Callable] = {}


def shared_jit(key: tuple, builder: Callable[[], Callable]) -> Callable:
    """Return the process-wide callable for ``key``, building it on first
    use. Unhashable keys (exotic module attributes) fall back to an uncached
    build — correct, just per-instance like before."""
    try:
        fn = _SHARED.get(key)
    except TypeError:
        return builder()
    if fn is None:
        fn = builder()
        _SHARED[key] = fn
    return fn
