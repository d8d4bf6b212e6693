"""Sentence → token → fragment splitting and greedy block packing.

Pure host-side algorithms reproduced from the reference's long-context
pipeline (modeling_open_provence_standalone.py:686-943, 2222-2259): the
framework's answer to sequence parallelism is to keep every device-side
sequence ≤ max_length by packing sentence fragments into blocks (SURVEY §5.7).

Device-facing difference vs the reference: blocks are later padded to
*bucketed* fixed shapes (inference/engine.py) instead of pad-to-batch-max, so
XLA compiles a small, fixed set of programs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass
from typing import Any

from .splitters import SentenceSplitter


@dataclass
class FragmentRecord:
    """Metadata for a context fragment (standalone:990-999)."""

    text: str
    sentence_index: int
    fragment_index: int
    global_index: int
    token_length: int
    token_ids: list[int]


def split_token_lists(
    token_lists: Sequence[Sequence[int]],
    max_fragment_tokens: int,
    *,
    keep_sentence_boundaries: bool = False,
) -> list[tuple[list[int], int, int, int]]:
    """Cut each sentence's token list into fixed-stride fragments
    (standalone:686-713). Returns (tokens, sentence_idx, fragment_idx,
    global_idx) tuples."""
    fragments: list[tuple[list[int], int, int, int]] = []
    global_index = 0
    step = max(1, int(max_fragment_tokens))
    for sentence_index, token_ids in enumerate(token_lists):
        tokens = list(token_ids)
        if not tokens:
            continue
        if keep_sentence_boundaries and len(tokens) <= max_fragment_tokens:
            fragments.append((tokens, int(sentence_index), 0, global_index))
            global_index += 1
            continue
        for fragment_index, start in enumerate(range(0, len(tokens), step)):
            fragment_tokens = tokens[start : start + step]
            if not fragment_tokens:
                continue
            fragments.append(
                (fragment_tokens, int(sentence_index), int(fragment_index), global_index)
            )
            global_index += 1
    return fragments


def collect_candidate_sentences(
    example: Mapping[str, Any], splitter: SentenceSplitter
) -> list[str]:
    """prefix sentences + (manual override | splitter output)
    (standalone:615-630)."""
    prefix_sentences = example.get("prefix_sentences") or []
    manual_sentences = example.get("manual_sentences")
    context_text = str(example.get("context_text", ""))
    sentences: list[str] = [str(s) for s in prefix_sentences if s is not None]
    if manual_sentences is not None:
        sentences.extend(str(s) for s in manual_sentences if s is not None)
    else:
        sentences.extend(str(s) for s in splitter(context_text) if s is not None)
    return sentences


def _split_multiline_sentence(text: str, strip_sentences: bool) -> list[str]:
    """(standalone:582-612)"""
    from .splitters import DEFAULT_ENGLISH_SENTENCE_MAX_CHARS

    if "\n" not in text:
        return [text.strip() if strip_sentences else text]
    segments = text.splitlines(keepends=not strip_sentences)
    meaningful = [segment for segment in segments if segment.strip()]
    if len(meaningful) <= 1:
        return [text.strip() if strip_sentences else text]
    punctuation_count = sum(1 for ch in text if ch in ".?!")
    if punctuation_count >= len(meaningful):
        return [text.strip() if strip_sentences else text]
    if any(len(seg.strip()) > DEFAULT_ENGLISH_SENTENCE_MAX_CHARS for seg in meaningful):
        return [text.strip() if strip_sentences else text]
    processed: list[str] = []
    for segment in meaningful:
        value = segment.strip() if strip_sentences else segment
        if value:
            processed.append(value)
    return processed or [text.strip() if strip_sentences else text]


def fallback_sentence(context_text: str, strip_sentences: bool) -> str:
    if not strip_sentences:
        return context_text
    stripped = context_text.strip()
    return stripped or context_text


def normalize_sentences(
    raw_sentences: Sequence[str], context_text: str, strip_sentences: bool
) -> list[str]:
    """(standalone:640-661)"""
    sentences: list[str] = []
    for entry in raw_sentences:
        text = str(entry)
        if not text:
            continue
        for segment in _split_multiline_sentence(text, strip_sentences):
            if segment:
                sentences.append(segment)
    if sentences:
        return sentences
    return [fallback_sentence(context_text, strip_sentences)]


def tokenize_sentences(tokenizer: Any, sentences: Sequence[str]) -> list[list[int]]:
    """Batch-encode sentences without special tokens (standalone:664-672)."""
    if not sentences:
        return []
    tokenized = tokenizer(
        list(sentences), add_special_tokens=False, return_attention_mask=False
    )
    if isinstance(tokenized, Mapping):
        return [list(ids) for ids in tokenized.get("input_ids", [])]
    return [list(ids) for ids in getattr(tokenized, "input_ids", [])]


def decode_and_filter_fragments(
    tokenizer: Any,
    fragments: Sequence[tuple[list[int], int, int, int]],
    *,
    strip_sentences: bool,
) -> dict[str, list[Any]]:
    """(standalone:846-894)"""
    if not fragments:
        return {
            "fragment_texts": [],
            "fragment_token_ids": [],
            "fragment_sentence_index": [],
            "fragment_fragment_index": [],
            "fragment_global_index": [],
        }
    token_sequences = [tokens for tokens, _, _, _ in fragments]
    fragment_texts = tokenizer.batch_decode(
        token_sequences, skip_special_tokens=True, clean_up_tokenization_spaces=False
    )
    payload: dict[str, list[Any]] = {
        "fragment_texts": [],
        "fragment_token_ids": [],
        "fragment_sentence_index": [],
        "fragment_fragment_index": [],
        "fragment_global_index": [],
    }
    for text, (tokens, sentence_idx, fragment_idx, global_idx) in zip(
        fragment_texts, fragments
    ):
        processed_text = text.strip() if strip_sentences else text
        if strip_sentences:
            if not processed_text:
                continue
        else:
            if not text:
                continue
        payload["fragment_texts"].append(processed_text)
        payload["fragment_token_ids"].append(list(tokens))
        payload["fragment_sentence_index"].append(sentence_idx)
        payload["fragment_fragment_index"].append(fragment_idx)
        payload["fragment_global_index"].append(global_idx)
    return payload


def fragmentize_job(
    tokenizer: Any,
    job: dict[str, Any],
    *,
    max_fragment_tokens: int,
    splitter: SentenceSplitter,
    strip_sentences: bool,
    respect_sentence_boundaries: bool,
) -> dict[str, Any]:
    """Full fragmentation of one preprocessing job (standalone:897-943),
    with the reference's per-stage timing keys (standalone:934-941)."""
    from time import perf_counter

    context_text = str(job.get("context_text", ""))
    cached_sentences = job.get("cached_sentences")
    collect_time = normalize_time = 0.0
    if cached_sentences is not None:
        sentences = [str(s) for s in cached_sentences]
    else:
        start = perf_counter()
        raw = collect_candidate_sentences(job, splitter)
        collect_time = perf_counter() - start
        start = perf_counter()
        sentences = normalize_sentences(raw, context_text, strip_sentences)
        normalize_time = perf_counter() - start

    cached_token_lists = job.get("cached_token_lists")
    tokenize_time = 0.0
    if cached_token_lists is not None:
        token_lists = [[int(t) for t in tokens] for tokens in cached_token_lists]
    else:
        start = perf_counter()
        token_lists = tokenize_sentences(tokenizer, sentences)
        tokenize_time = perf_counter() - start

    start = perf_counter()
    fragments = split_token_lists(
        token_lists,
        max_fragment_tokens,
        keep_sentence_boundaries=respect_sentence_boundaries,
    )
    split_time = perf_counter() - start
    if not fragments:
        fallback_source = fallback_sentence(context_text, strip_sentences)
        fallback_tokens = tokenizer.encode(fallback_source, add_special_tokens=False)
        fragments = [(list(fallback_tokens), 0, 0, 0)]

    start = perf_counter()
    payload = decode_and_filter_fragments(
        tokenizer, fragments, strip_sentences=strip_sentences
    )
    decode_time = perf_counter() - start
    if not payload["fragment_token_ids"]:
        tokens, sentence_idx, fragment_idx, global_idx = fragments[0]
        decoded_text = tokenizer.decode(
            tokens, skip_special_tokens=True, clean_up_tokenization_spaces=False
        )
        processed_text = decoded_text.strip() if strip_sentences else decoded_text
        payload = {
            "fragment_texts": [processed_text],
            "fragment_token_ids": [list(tokens)],
            "fragment_sentence_index": [sentence_idx],
            "fragment_fragment_index": [fragment_idx],
            "fragment_global_index": [global_idx],
        }
    entry = {
        "sentences": sentences,
        "timing_sentence_collect": collect_time,
        "timing_sentence_normalize": normalize_time,
        "timing_tokenize": tokenize_time,
        "timing_fragment_split": split_time,
        "timing_fragment_decode": decode_time,
    }
    entry.update(payload)
    return entry


def fragments_from_payload(payload: Mapping[str, Any]) -> list[FragmentRecord]:
    records: list[FragmentRecord] = []
    texts = payload.get("fragment_texts", [])
    token_id_lists = payload.get("fragment_token_ids", [])
    sentence_indices = payload.get("fragment_sentence_index", [])
    fragment_indices = payload.get("fragment_fragment_index", [])
    global_indices = payload.get("fragment_global_index", [])
    for idx, text in enumerate(texts):
        tokens = list(token_id_lists[idx]) if idx < len(token_id_lists) else []
        records.append(
            FragmentRecord(
                text=text,
                sentence_index=int(sentence_indices[idx]) if idx < len(sentence_indices) else 0,
                fragment_index=int(fragment_indices[idx]) if idx < len(fragment_indices) else 0,
                global_index=int(global_indices[idx]) if idx < len(global_indices) else idx,
                token_length=len(tokens),
                token_ids=tokens,
            )
        )
    return records


def truncate_fragment(
    tokenizer: Any, fragment: FragmentRecord, max_tokens: int
) -> FragmentRecord:
    """(standalone:2082-2102)"""
    if max_tokens <= 0:
        max_tokens = 1
    if fragment.token_length <= max_tokens:
        return fragment
    new_tokens = fragment.token_ids[:max_tokens]
    new_text = tokenizer.decode(
        new_tokens, skip_special_tokens=True, clean_up_tokenization_spaces=False
    )
    return FragmentRecord(
        text=new_text,
        sentence_index=fragment.sentence_index,
        fragment_index=fragment.fragment_index,
        global_index=fragment.global_index,
        token_length=len(new_tokens),
        token_ids=list(new_tokens),
    )


def assemble_blocks(
    tokenizer: Any,
    max_length: int,
    query_token_length: int,
    sep_token_length: int,
    fragments: list[FragmentRecord],
) -> list[list[FragmentRecord]]:
    """Greedy packing of fragments into ≤max_length blocks
    (standalone:2222-2259): available = max_length − 2 specials; oversize
    fragments truncated to the remaining capacity. The packing plan is
    computed by the native op (open_provence_tpu/native); truncation text
    decoding stays host-Python (needs the tokenizer)."""
    if not fragments:
        return []
    available_len = max_length - 2  # [CLS], [SEP]
    base_len = query_token_length + sep_token_length
    max_fragment_capacity = max(1, available_len - base_len)

    from ..native import greedy_pack

    block_ids, new_lens, n_blocks = greedy_pack(
        [f.token_length for f in fragments], base_len, available_len
    )
    blocks: list[list[FragmentRecord]] = [[] for _ in range(n_blocks)]
    for fragment, block_id, new_len in zip(fragments, block_ids, new_lens):
        if new_len < fragment.token_length:
            fragment = truncate_fragment(tokenizer, fragment, max_fragment_capacity)
        blocks[int(block_id)].append(fragment)
    return blocks


def max_fragment_tokens_for(max_length: int, respect_sentence_boundaries: bool) -> int:
    """(standalone:3490-3493)"""
    if respect_sentence_boundaries:
        return max(16, max_length - 2)
    return max(16, max_length // 2)
