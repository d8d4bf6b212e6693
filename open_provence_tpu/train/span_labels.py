"""Token-level pruning label generation from character spans.

Two strategies, mirroring the reference collator
(open_provence/data_collator.py:322-707):

* v2 — progressive re-encoding of query + span prefixes to get exact token
  spans (tokenizer-agnostic, handles subword merges at span joins); the
  document start is discovered via a "test"-token probe.
* v1 — offset-mapping + SEP/EOS boundary detection fallback.

Labels: -100 for query/special/tail tokens (ignored in loss), 1 for tokens
in relevant chunks, 0 for tokens in non-relevant chunks.

Unlike the reference (which re-encodes inside the hot collator call, a known
CPU cost — SURVEY §3.1), these functions are designed to be applied once in
a dataset ``.map`` precompute; the collator then only pads fixed shapes.
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

logger = logging.getLogger(__name__)


def compute_span_token_positions(
    tokenizer: Any, query: str, spans: list[str]
) -> list[tuple[int, int]]:
    """Token positions of each span within the encoded (query, document)
    pair (reference data_collator.py:504-632)."""
    if not spans:
        return []

    progressive_texts = []
    accumulated_text = ""
    for i, span in enumerate(spans):
        if i > 0:
            accumulated_text += " "
        accumulated_text += span
        progressive_texts.append([query, accumulated_text])

    query_only = tokenizer(
        [query],
        add_special_tokens=True,
        padding=False,
        truncation=False,
        return_attention_mask=False,
    )
    query_length = len(query_only["input_ids"][0])

    test_pair = tokenizer(
        [[query, "test"]],
        add_special_tokens=True,
        padding=False,
        truncation=False,
        return_attention_mask=False,
    )
    test_tokens = list(test_pair["input_ids"][0])
    test_only = tokenizer(
        ["test"],
        add_special_tokens=False,
        padding=False,
        truncation=False,
        return_attention_mask=False,
    )
    test_token_ids = list(test_only["input_ids"][0])

    doc_start_offset = None
    for i in range(query_length, len(test_tokens) - len(test_token_ids) + 1):
        if test_tokens[i : i + len(test_token_ids)] == test_token_ids:
            doc_start_offset = i
            break
    if doc_start_offset is None:
        doc_start_offset = query_length

    span_positions: list[tuple[int, int]] = []
    prev_doc_length = 0
    for i in range(len(spans)):
        current_doc = ""
        for j in range(i + 1):
            if j > 0:
                current_doc += " "
            current_doc += spans[j]
        doc_only = tokenizer(
            [current_doc],
            add_special_tokens=False,
            padding=False,
            truncation=False,
            return_attention_mask=False,
        )
        current_doc_length = len(doc_only["input_ids"][0])
        span_start = doc_start_offset + prev_doc_length
        span_end = doc_start_offset + current_doc_length
        span_positions.append((span_start, span_end))
        prev_doc_length = current_doc_length

    return span_positions


def validate_span_tokenization(
    tokenizer: Any,
    query: str,
    spans: list[str],
    span_positions: list[tuple[int, int]],
) -> bool:
    """Decode each span's token range and check it matches the original text
    (reference data_collator.py:635-707)."""
    doc_text = ""
    for i, span in enumerate(spans):
        if i > 0:
            doc_text += " "
        doc_text += span
    encoding = tokenizer(
        [[query, doc_text]],
        add_special_tokens=True,
        padding=False,
        truncation=False,
        return_attention_mask=False,
    )
    tokens = list(encoding["input_ids"][0])
    for i, (span_text, (start_pos, end_pos)) in enumerate(zip(spans, span_positions)):
        decoded_text = tokenizer.decode(tokens[start_pos:end_pos], skip_special_tokens=True)
        normalized_original = " ".join(span_text.split())
        normalized_decoded = " ".join(decoded_text.split())
        if normalized_original != normalized_decoded:
            if normalized_original.lower() == normalized_decoded.lower():
                continue
            decoded_lower = normalized_decoded.lower().replace(" ", "")
            if not all(w.lower() in decoded_lower for w in normalized_original.lower().split()):
                logger.warning(
                    "Span %d mismatch: original=%r decoded=%r positions=%d-%d",
                    i, normalized_original, normalized_decoded, start_pos, end_pos,
                )
                return False
    return True


def labels_from_span_positions(
    seq_length: int,
    span_positions: list[tuple[int, int]],
    relevant_chunks: list[int],
) -> np.ndarray:
    """v2 label array: -100 baseline; relevant spans → 1, others → 0
    (reference data_collator.py:344-383)."""
    labels = np.full((seq_length,), -100, dtype=np.int64)
    for chunk_idx in relevant_chunks:
        if chunk_idx < len(span_positions):
            start, end = span_positions[chunk_idx]
            start = min(start, seq_length)
            end = min(end, seq_length)
            labels[start:end] = 1
    for chunk_idx in range(len(span_positions)):
        if chunk_idx not in relevant_chunks:
            start, end = span_positions[chunk_idx]
            start = min(start, seq_length)
            end = min(end, seq_length)
            labels[start:end] = 0
    return labels


def normalize_relevant_chunks(
    relevant_chunks_raw: list[Any], chunks_pos: list[Any]
) -> list[list[int]]:
    """Convert binary masks [1,0,1] to index lists [0,2] when the length
    matches the chunk count (reference data_collator.py:190-206)."""
    relevant_chunks: list[list[int]] = []
    for text_idx, chunk_labels in enumerate(relevant_chunks_raw):
        if isinstance(chunk_labels, list) and len(chunk_labels) > 0:
            if text_idx < len(chunks_pos) and len(chunk_labels) == len(
                chunks_pos[text_idx]
            ) and all(label in (0, 1) for label in chunk_labels):
                relevant_chunks.append(
                    [idx for idx, label in enumerate(chunk_labels) if label == 1]
                )
            else:
                relevant_chunks.append(list(chunk_labels))
        else:
            relevant_chunks.append(list(chunk_labels) if isinstance(chunk_labels, list) else chunk_labels)
    return relevant_chunks


def generate_labels_v1(
    input_ids: np.ndarray,
    offsets: np.ndarray,
    chunk_positions: list[list[int]],
    relevant_chunks: list[int],
    *,
    sep_token_id: int | None,
    eos_token_id: int,
    has_sep_token: bool,
) -> np.ndarray:
    """Offset-mapping fallback for one pair (reference
    data_collator.py:385-501). input_ids [L], offsets [L, 2]."""
    seq_length = int(input_ids.shape[0])
    labels = np.zeros((seq_length,), dtype=np.int64)

    if has_sep_token and sep_token_id is not None:
        sep_positions = np.nonzero(input_ids == sep_token_id)[0]
        if len(sep_positions) >= 2:
            doc_start_token = int(sep_positions[0]) + 1
            doc_end_token = int(sep_positions[1])
        else:
            return labels
    else:
        sep_positions = np.nonzero(input_ids == eos_token_id)[0]
        if len(sep_positions) >= 2:
            doc_start_token = int(sep_positions[0]) + 2
            doc_end_token = int(sep_positions[1])
        else:
            return labels

    doc_offset = 0
    for i in range(doc_start_token, min(doc_start_token + 5, doc_end_token)):
        if offsets[i][0] != 0 or offsets[i][1] != 0:
            doc_offset = int(offsets[i][0])
            break

    labels[:doc_start_token] = -100
    for token_idx in range(doc_start_token, doc_end_token):
        token_start, token_end = int(offsets[token_idx][0]), int(offsets[token_idx][1])
        if token_start == 0 and token_end == 0:
            continue
        token_start_rel = token_start - doc_offset
        token_end_rel = token_end - doc_offset
        for chunk_idx in relevant_chunks:
            if chunk_idx < len(chunk_positions):
                chunk_start, chunk_end = chunk_positions[chunk_idx]
                if token_start_rel < chunk_end and token_end_rel > chunk_start:
                    labels[token_idx] = 1
                    break
    labels[doc_end_token:] = -100
    return labels
