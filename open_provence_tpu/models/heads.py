"""Pruning head: dropout + Linear(hidden, 2) token classifier, plus
boundary-based sentence pooling.

JAX counterpart of the reference ``OpenProvenceHead``
(open_provence/models/open_provence_head.py:52-281; minimal inference copy
at modeling_open_provence_standalone.py:407-448). The default inference path
ignores sentence boundaries — sentence aggregation happens in the process
engine — but the boundary-pooled sentence loss / prediction variants
(reference :147-281) are provided as vectorized functions (mask-based
reductions instead of the reference's per-sentence Python loops)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import PruningHeadConfig


class PruningHead(nn.Module):
    config: PruningHeadConfig

    @nn.compact
    def __call__(
        self, hidden_states: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        x = hidden_states
        if cfg.classifier_dropout > 0.0:
            x = nn.Dropout(cfg.classifier_dropout)(x, deterministic=deterministic)
        return nn.Dense(cfg.num_labels, name="classifier")(x)


def _boundary_masks(
    boundaries: jnp.ndarray, seq_len: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """boundaries [B, M, 2] (start, end; -1 padding) → token membership mask
    [B, M, S] and validity [B, M]."""
    starts = boundaries[..., 0]
    ends = boundaries[..., 1]
    valid = (starts != -1) & (ends != -1) & (ends > starts)
    positions = jnp.arange(seq_len)[None, None, :]
    member = (positions >= starts[..., None]) & (positions < ends[..., None])
    return member & valid[..., None], valid


def pool_sentence_values(
    values: jnp.ndarray,  # [B, S, C] per-token values (logits or probs)
    boundaries: jnp.ndarray,  # [B, M, 2]
    pooling: str = "mean",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pool token values per sentence boundary → ([B, M, C], valid [B, M]).

    Pooling ∈ {mean, max, first, last} (reference open_provence_head.py
    :186-199). Invalid boundaries yield zeros."""
    seq_len = values.shape[1]
    member, valid = _boundary_masks(boundaries, seq_len)  # [B,M,S], [B,M]
    member_f = member.astype(values.dtype)
    if pooling == "max":
        neg = jnp.finfo(values.dtype).min
        masked = jnp.where(member[..., None], values[:, None, :, :], neg)
        pooled = masked.max(axis=2)
        pooled = jnp.where(valid[..., None], pooled, 0.0)
    elif pooling == "first":
        first_idx = jnp.argmax(member, axis=-1)  # [B, M]
        pooled = jnp.take_along_axis(
            values, first_idx.reshape(values.shape[0], -1, 1), axis=1
        ).reshape(*first_idx.shape, values.shape[-1])
        pooled = jnp.where(valid[..., None], pooled, 0.0)
    elif pooling == "last":
        positions = jnp.arange(seq_len)[None, None, :]
        last_idx = jnp.where(member, positions, -1).max(axis=-1)
        last_idx = jnp.maximum(last_idx, 0)
        pooled = jnp.take_along_axis(
            values, last_idx.reshape(values.shape[0], -1, 1), axis=1
        ).reshape(*last_idx.shape, values.shape[-1])
        pooled = jnp.where(valid[..., None], pooled, 0.0)
    else:  # mean (default)
        sums = jnp.einsum("bms,bsc->bmc", member_f, values)
        counts = member_f.sum(axis=-1, keepdims=True)
        pooled = sums / jnp.maximum(counts, 1.0)
    return pooled, valid


def sentence_loss(
    logits: jnp.ndarray,  # [B, S, C] token logits
    labels: jnp.ndarray,  # [B, M] sentence labels
    boundaries: jnp.ndarray,  # [B, M, 2]
    pooling: str = "mean",
) -> jnp.ndarray:
    """CE over boundary-pooled sentence logits (reference
    open_provence_head.py:147-215); invalid boundaries are excluded."""
    pooled, valid = pool_sentence_values(logits.astype(jnp.float32), boundaries, pooling)
    log_probs = jax.nn.log_softmax(pooled, axis=-1)
    safe_labels = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    num_valid = valid.sum()
    loss = -jnp.where(valid, picked, 0.0).sum() / jnp.maximum(num_valid, 1)
    return jnp.where(num_valid == 0, 0.0, loss)


def predict_sentences(
    logits: jnp.ndarray,  # [B, S, C] token logits
    boundaries: jnp.ndarray,  # [B, M, 2]
    pooling: str = "mean",
) -> jnp.ndarray:
    """Sentence probabilities by pooling token softmax probs (reference
    open_provence_head.py:217-281); invalid boundaries → uniform 1/C."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pooled, valid = pool_sentence_values(probs, boundaries, pooling)
    uniform = jnp.full_like(pooled, 1.0 / pooled.shape[-1])
    return jnp.where(valid[..., None], pooled, uniform)
