"""Device-side fragment mean pooling.

The reference aggregates token keep-probabilities into fragment means on the
host with numpy (standalone:3065-3120). Here the reduction runs on device so
only the small [B, F] fragment-mean matrix crosses the device→host boundary
instead of [B, S] token probabilities.

Fragments are CONTIGUOUS token ranges, so per-fragment sums are cumulative-sum
differences: one [B, S] cumsum plus two [B, F] gathers. The previous
formulation (one-hot [B, S, F] einsum) materialized a 32 MB operand and ran
as 32 batched matvecs — ~35 ms per (32, 512) batch, i.e. as much as the
whole backbone forward. fp32 cumsum-difference rounding differs from a
direct per-fragment sum by ≲3e-5 absolute on 512-token rows — far below the
keep-threshold granularity (thresholds are 0.05+).
"""

from __future__ import annotations

import jax.numpy as jnp


def fragment_mean_pool_ranges(
    probs: jnp.ndarray,   # [B, S] fp32 keep probabilities
    starts: jnp.ndarray,  # [B, F] int32 fragment start (inclusive)
    ends: jnp.ndarray,    # [B, F] int32 fragment end (exclusive); == start → empty
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (means [B, F], counts [B, F]). Empty slots get mean 0."""
    starts = starts.astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    csum = jnp.cumsum(probs.astype(jnp.float32), axis=1)  # [B, S]
    upper = jnp.take_along_axis(csum, jnp.maximum(ends - 1, 0), axis=1)
    lower = jnp.where(
        starts > 0,
        jnp.take_along_axis(csum, jnp.maximum(starts - 1, 0), axis=1),
        0.0,
    )
    counts = jnp.maximum(ends - starts, 0).astype(jnp.float32)
    sums = jnp.where(counts > 0, upper - lower, 0.0)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
    return means, counts


def fragment_mean_pool(
    probs: jnp.ndarray,  # [B, S] fp32 keep probabilities
    segment_ids: jnp.ndarray,  # [B, S] int32 in [0, F); >= F or < 0 → ignored
    num_segments: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-id variant (kept for non-contiguous callers/tests): returns
    (means [B, F], counts [B, F]); empty segments get mean 0."""
    seg = segment_ids.astype(jnp.int32)
    valid = (seg >= 0) & (seg < num_segments)
    # Broadcast iota-compare, NOT a scatter: `.at[...].set()` lowered to an
    # XLA scatter over [B, S, F], which TPU serializes; the compare fuses
    # into the einsum operand instead.
    frag_iota = jnp.arange(num_segments, dtype=jnp.int32)
    onehot = (
        (seg[..., None] == frag_iota) & valid[..., None]
    ).astype(jnp.float32)
    sums = jnp.einsum("bs,bsf->bf", probs.astype(jnp.float32), onehot)
    counts = jnp.einsum("bs,bsf->bf", jnp.ones_like(probs, dtype=jnp.float32), onehot)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
    return means, counts
