"""Rotary position embeddings for the JAX ModernBERT backbone.

ModernBERT uses the "default" (non-interleaved, rotate-half) RoPE variant with
a per-layer theta: 10k for local-attention layers, 160k for global layers
(reference architecture; cf. /root/reference SURVEY §2.3). cos/sin tables are
computed in float32 and cast to the activation dtype, matching the upstream
numerics that checkpoints were trained with.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _rope_tables_cached(seq_len: int, head_dim: int, theta: float):
    import numpy as np

    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    positions = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(positions, inv_freq)  # [S, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [S, D]
    return np.cos(emb), np.sin(emb)


def rope_tables(seq_len: int, head_dim: int, theta: float, dtype=jnp.float32):
    """Return (cos, sin) of shape [seq_len, head_dim] (host-cached, fp32 math)."""
    cos, sin = _rope_tables_cached(int(seq_len), int(head_dim), float(theta))
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding.

    q, k: [..., S, D]; cos, sin: [S, D] (broadcast over leading dims).
    """
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot, k_rot
