"""process() input-shape contract: normalization of questions, contexts, and
titles (reference modeling_open_provence_standalone.py:2261-2434).

Four context structures: ``str`` (one query, one context), ``list`` (one
query, many contexts), ``aligned`` (N queries ↔ N contexts), ``nested``
(N queries ↔ N context lists; inner lists are pre-split sentences).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any


def _is_sequence(value: Any) -> bool:
    return isinstance(value, Sequence) and not isinstance(value, (str, bytes, bytearray))


def normalize_inputs(
    question: str | Sequence[str],
    context: Any,
) -> tuple[list[str], list[list[Any]], str]:
    """(standalone:2261-2323)"""
    if isinstance(question, str):
        queries = [question]
    else:
        queries = [str(q) for q in question]

    def _normalize_context_collection(values: Sequence[Any]) -> list[Any]:
        normalized: list[Any] = []
        for item in values:
            if _is_sequence(item):
                normalized.append([str(element) for element in item])
            else:
                normalized.append(str(item))
        return normalized

    if isinstance(context, str):
        context_structure = "str"
        contexts: list[list[Any]] = [[context]]
    elif not _is_sequence(context):
        raise ValueError("Unsupported context format")
    elif len(queries) == 1:
        normalized_contexts = _normalize_context_collection(context)
        context_structure = "list"
        contexts = [normalized_contexts]
    else:
        context_sequence = list(context)
        all_scalars = all(not _is_sequence(entry) for entry in context_sequence)
        if all_scalars:
            if len(context_sequence) != len(queries):
                raise ValueError("Number of contexts must match number of queries")
            context_structure = "aligned"
            contexts = [[str(entry)] for entry in context_sequence]
        else:
            context_structure = "nested"
            normalized_nested: list[list[Any]] = []
            for entry in context_sequence:
                if not _is_sequence(entry):
                    raise ValueError("Number of context lists must match number of queries")
                normalized_nested.append(_normalize_context_collection(entry))
            contexts = normalized_nested

    if context_structure == "list" and len(queries) != 1:
        raise ValueError("Single list of contexts requires a single query")
    if context_structure == "nested" and len(contexts) != len(queries):
        raise ValueError("Number of context lists must match number of queries")
    if context_structure == "str" and len(queries) != 1:
        raise ValueError("Single context string requires a single query")

    if context_structure in {"str", "list"}:
        contexts = [contexts[0]]

    return queries, contexts, context_structure


def prepare_titles(
    title: Any,
    queries: list[str],
    contexts: list[list[Any]],
) -> list[Any]:
    """(standalone:2325-2360)"""
    n_queries = len(queries)
    if title is None:
        return [None] * n_queries
    if isinstance(title, str):
        if title == "first_sentence":
            return ["first_sentence"] * n_queries
        return [[title for _ in ctxs] for ctxs in contexts]
    if isinstance(title, Sequence):
        normalized: list[Any] = []
        for entry in title:
            if isinstance(entry, Sequence) and not isinstance(entry, str):
                normalized.append([str(value) for value in entry])
            else:
                normalized.append(str(entry))
        if n_queries == 1 and all(isinstance(item, str) for item in normalized):
            return [[str(item) for item in normalized]]
        if len(normalized) == n_queries and all(isinstance(item, list) for item in normalized):
            return [list(map(str, item)) for item in normalized]
        if len(normalized) == n_queries and all(isinstance(item, str) for item in normalized):
            return [[value for _ in contexts[idx]] for idx, value in enumerate(normalized)]
    raise ValueError("Unsupported title format")


def extract_first_line_titles(
    contexts: list[list[Any]],
) -> tuple[list[list[Any]], list[list[str]]]:
    """Split the first non-empty line off each context as a title candidate
    (standalone:2362-2410)."""
    updated_contexts: list[list[Any]] = []
    extracted_titles: list[list[str]] = []
    for context_group in contexts:
        group_titles: list[str] = []
        updated_group: list[Any] = []
        for entry in context_group:
            if isinstance(entry, list):
                normalized = [str(value) for value in entry]
                title_candidate = ""
                remainder: list[str] = []
                for idx, segment in enumerate(normalized):
                    if segment.strip():
                        title_candidate = segment.rstrip("\r\n")
                        remainder = normalized[idx + 1 :]
                        break
                else:
                    remainder = normalized
                group_titles.append(title_candidate)
                updated_group.append(remainder)
            else:
                text_entry = str(entry)
                title_candidate = ""
                remainder_text = ""
                if text_entry:
                    lines = text_entry.splitlines(keepends=True)
                    remainder_segments: list[str] = []
                    for idx, line in enumerate(lines):
                        if line.strip():
                            title_candidate = line.rstrip("\r\n")
                            remainder_segments = lines[idx + 1 :]
                            break
                    else:
                        remainder_segments = lines
                    remainder_text = "".join(remainder_segments)
                group_titles.append(title_candidate)
                updated_group.append(remainder_text)
        extracted_titles.append(group_titles)
        updated_contexts.append(updated_group)
    return updated_contexts, extracted_titles


def resolve_titles(
    queries: list[str],
    contexts: list[list[Any]],
    title: Any,
    *,
    first_line_as_title: bool,
) -> tuple[list[list[Any]], list[Any]]:
    """(standalone:2412-2434)"""
    if first_line_as_title:
        if title not in (None, "first_sentence"):
            raise ValueError(
                "first_line_as_title=True cannot be combined with an explicit title override."
            )
        contexts, extracted_titles = extract_first_line_titles(contexts)
        title_payload: Any = extracted_titles
    else:
        title_payload = title
    titles = prepare_titles(title_payload, queries, contexts)
    return contexts, titles


def resolve_prefix_sentences(
    title_spec: Any,
    context_idx: int,
) -> tuple[list[str], bool]:
    """(standalone:1971-2005)"""
    prefix_sentences: list[str] = []
    title_is_first_sentence = False
    if title_spec == "first_sentence":
        title_is_first_sentence = True
    elif isinstance(title_spec, list):
        if title_spec and isinstance(title_spec[0], list):
            raw_title = title_spec[context_idx] if context_idx < len(title_spec) else None
            if raw_title:
                prefix_sentences.extend(
                    [t.strip() for t in raw_title if isinstance(t, str) and t.strip()]
                )
        else:
            raw_title = title_spec[context_idx] if context_idx < len(title_spec) else None
            if isinstance(raw_title, str) and raw_title.strip():
                prefix_sentences.append(raw_title.strip())
    elif isinstance(title_spec, str) and title_spec.strip():
        prefix_sentences.append(title_spec.strip())

    if prefix_sentences:
        last_idx = len(prefix_sentences) - 1
        prefix_sentences[last_idx] = prefix_sentences[last_idx].rstrip("\n") + "\n"
    return prefix_sentences, title_is_first_sentence
