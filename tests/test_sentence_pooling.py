"""Boundary-based sentence pooling/loss golden tests vs the reference's
torch OpenProvenceHead loops."""

import sys
from pathlib import Path

import numpy as np
import pytest

from open_provence_tpu.models.heads import (
    pool_sentence_values,
    predict_sentences,
    sentence_loss,
)

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = (REFERENCE_ROOT / "open_provence").exists()


def _case(seed=0, batch=2, seq=12, n_sent=4):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(batch, seq, 2)).astype(np.float32)
    boundaries = np.full((batch, n_sent, 2), -1, dtype=np.int64)
    for b in range(batch):
        cursor = 0
        for s in range(n_sent - 1):
            length = int(rng.integers(1, 4))
            if cursor + length > seq:
                break
            boundaries[b, s] = [cursor, cursor + length]
            cursor += length
    labels = rng.integers(0, 2, size=(batch, n_sent))
    return logits, boundaries, labels


@pytest.mark.parametrize("pooling", ["mean", "max", "first", "last"])
def test_pool_sentence_values_matches_manual(pooling):
    logits, boundaries, _ = _case()
    pooled, valid = pool_sentence_values(logits, boundaries, pooling)
    pooled = np.asarray(pooled)
    for b in range(logits.shape[0]):
        for s in range(boundaries.shape[1]):
            start, end = boundaries[b, s]
            if start == -1 or end == -1:
                assert not bool(np.asarray(valid)[b, s])
                continue
            seg = logits[b, start:end]
            if pooling == "mean":
                expected = seg.mean(axis=0)
            elif pooling == "max":
                expected = seg.max(axis=0)
            elif pooling == "first":
                expected = seg[0]
            else:
                expected = seg[-1]
            np.testing.assert_allclose(pooled[b, s], expected, atol=1e-6)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
@pytest.mark.parametrize("pooling", ["mean", "max", "first", "last"])
def test_golden_sentence_loss_and_predict(pooling):
    torch = pytest.importorskip("torch")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    from open_provence.models.open_provence_head import (
        OpenProvenceHead,
        OpenProvenceHeadConfig,
    )

    logits, boundaries, labels = _case(seed=3)
    config = OpenProvenceHeadConfig(hidden_size=2, sentence_pooling=pooling)
    head = OpenProvenceHead(config)

    ref_loss = head._compute_sentence_loss(
        torch.tensor(logits), torch.tensor(labels), torch.tensor(boundaries)
    ).item()
    our_loss = float(sentence_loss(logits, labels, boundaries, pooling))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=1e-5)

    # predict_sentences: run the reference head with an identity-ish path —
    # it applies dropout(eval)+linear to hidden states; to isolate pooling
    # we compare our probs against pooled softmax of the same logits.
    probs = np.asarray(predict_sentences(logits, boundaries, pooling))
    t_probs = torch.softmax(torch.tensor(logits), dim=-1)
    for b in range(logits.shape[0]):
        for s in range(boundaries.shape[1]):
            start, end = boundaries[b, s]
            if start == -1 or end == -1:
                np.testing.assert_allclose(probs[b, s], [0.5, 0.5], atol=1e-6)
                continue
            seg = t_probs[b, start:end]
            if pooling == "mean":
                expected = seg.mean(dim=0)
            elif pooling == "max":
                expected = seg.max(dim=0)[0]
            elif pooling == "first":
                expected = seg[0]
            else:
                expected = seg[-1]
            np.testing.assert_allclose(probs[b, s], expected.numpy(), atol=1e-6)


def test_fragment_mean_pool_ranges_matches_numpy():
    """Cumsum-difference pooling must match direct numpy fragment means
    (fragments are contiguous ranges)."""
    import jax.numpy as jnp
    from open_provence_tpu.ops.segment import (
        fragment_mean_pool,
        fragment_mean_pool_ranges,
    )

    rng = np.random.default_rng(11)
    B, S = 4, 96
    probs = rng.uniform(size=(B, S)).astype(np.float32)
    starts = np.zeros((B, S), np.int32)
    ends = np.zeros((B, S), np.int32)
    seg_ids = np.full((B, S), -1, np.int32)
    expected = np.zeros((B, S), np.float32)
    for b in range(B):
        pos, j = rng.integers(0, 8), 0
        while pos < S and j < S:
            ln = int(rng.integers(1, 12))
            end = min(pos + ln, S)
            starts[b, j], ends[b, j] = pos, end
            seg_ids[b, pos:end] = j
            expected[b, j] = probs[b, pos:end].mean()
            pos = end + int(rng.integers(0, 3))  # occasional gap
            j += 1
    means, counts = fragment_mean_pool_ranges(
        jnp.asarray(probs), jnp.asarray(starts), jnp.asarray(ends)
    )
    np.testing.assert_allclose(np.asarray(means), expected, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(counts), (ends - starts).clip(min=0).astype(np.float32)
    )
    # and the segment-id variant agrees
    m2, c2 = fragment_mean_pool(jnp.asarray(probs), jnp.asarray(seg_ids), S)
    np.testing.assert_allclose(np.asarray(m2), expected, atol=1e-5)
