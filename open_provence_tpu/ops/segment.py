"""Device-side fragment mean pooling.

The reference aggregates token keep-probabilities into fragment means on the
host with numpy (standalone:3065-3120). Here the reduction runs on device as
a one-hot matmul (MXU-friendly, fixed shapes): probs [B, S] × onehot segment
map [B, S, F] → per-fragment sums/counts → means. Only the small [B, F]
fragment-mean matrix crosses the device→host boundary instead of [B, S]
token probabilities.
"""

from __future__ import annotations

import jax.numpy as jnp


def fragment_mean_pool(
    probs: jnp.ndarray,  # [B, S] fp32 keep probabilities
    segment_ids: jnp.ndarray,  # [B, S] int32 in [0, F); >= F or < 0 → ignored
    num_segments: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (means [B, F], counts [B, F]). Empty segments get mean 0."""
    seg = segment_ids.astype(jnp.int32)
    valid = (seg >= 0) & (seg < num_segments)
    # Broadcast iota-compare, NOT a scatter: `.at[...].set()` lowered to an
    # XLA scatter over [B, S, F], which TPU serializes (measured ~100 ms per
    # 32x512 batch — it dominated process() inference time); the compare
    # fuses into the einsum operand instead.
    frag_iota = jnp.arange(num_segments, dtype=jnp.int32)
    onehot = (
        (seg[..., None] == frag_iota) & valid[..., None]
    ).astype(jnp.float32)
    sums = jnp.einsum("bs,bsf->bf", probs.astype(jnp.float32), onehot)
    counts = jnp.einsum("bs,bsf->bf", jnp.ones_like(probs, dtype=jnp.float32), onehot)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), 0.0)
    return means, counts
