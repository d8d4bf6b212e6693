"""Host-side aggregation of pruning outputs into user-facing structures.

Faithful reimplementation of the reference's postprocess stage
(modeling_open_provence_standalone.py:2962-3312, 3740-3805):

* fragment→sentence mean-probability pooling with the prefix-token offset
  correction (:3075-3081),
* threshold keep decisions with `always_select_title` forced keep (:3108-3132),
* compression % by characters (:3150-3153), `zero_score_when_empty` (:3155),
* `use_best_reranker_score` max-over-blocks (:3084-3092),
* reorder/top_k (:3204-3312) and str/list/aligned/nested output shape
  restoration (:3748-3788).
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Sequence
from typing import Any

import numpy as np

from ..text.fragmentation import FragmentRecord


class RawBlockPrediction:
    """Per-block raw outputs (counterpart of OpenProvenceRawPrediction,
    standalone:451-459).

    When ``fragment_means`` is set (device-side segment pooling fast path,
    exact only when no title-prefix offset correction applies), the
    postprocess uses it directly instead of re-deriving means from
    ``pruning_probs``."""

    __slots__ = ("ranking_score", "pruning_probs", "context_ranges", "fragment_means")

    def __init__(
        self,
        ranking_score: float | None,
        pruning_probs: np.ndarray | None,
        context_ranges: list[tuple[int, int]],
        fragment_means: np.ndarray | None = None,
    ):
        self.ranking_score = ranking_score
        self.pruning_probs = pruning_probs
        self.context_ranges = context_ranges
        self.fragment_means = fragment_means


def postprocess_contexts(
    queries: list[str],
    contexts: list[list[Any]],
    contexts_info: dict[tuple[int, int], dict[str, Any]],
    *,
    threshold: float,
    always_select_title: bool,
    use_best_reranker_score: bool,
    sentence_probability_groups_requested: bool,
    collect_sentence_texts: bool,
    first_line_as_title: bool,
    zero_score_when_empty: bool,
) -> tuple:
    pruned_contexts: list[list[str]] = []
    reranking_scores: list[list[float | None]] = []
    compression_rates: list[list[float]] = []
    kept_sentences: list[list[list[str]]] | None = [] if collect_sentence_texts else None
    removed_sentences: list[list[list[str]]] | None = [] if collect_sentence_texts else None
    title_values: list[list[Any]] = []
    sentence_probability_groups: list[list[list[float]]] | None = (
        [] if sentence_probability_groups_requested else None
    )

    for query_idx, _ in enumerate(queries):
        query_pruned: list[str] = []
        query_scores: list[float | None] = []
        query_compression: list[float] = []
        query_kept: list[list[str]] | None = [] if collect_sentence_texts else None
        query_removed: list[list[str]] | None = [] if collect_sentence_texts else None
        query_titles: list[Any] = []
        query_sentence_probabilities: list[list[float]] | None = (
            [] if sentence_probability_groups is not None else None
        )

        for context_idx, context_entry in enumerate(contexts[query_idx]):
            info = contexts_info.get((query_idx, context_idx))
            prefix_sentences_value: Sequence[str] = ()
            if info:
                raw_prefix = info.get("prefix_sentences", [])
                if isinstance(raw_prefix, str):
                    prefix_sentences_value = (raw_prefix,)
                elif isinstance(raw_prefix, Sequence):
                    prefix_sentences_value = tuple(str(item) for item in raw_prefix)
            if first_line_as_title and prefix_sentences_value:
                if len(prefix_sentences_value) == 1:
                    fallback_title: Any = prefix_sentences_value[0]
                else:
                    fallback_title = list(prefix_sentences_value)
            else:
                fallback_title = None

            context_sentence_probs: list[float] | None = (
                [] if sentence_probability_groups is not None else None
            )

            if not info or not info.get("fragments"):
                query_pruned.append(context_entry)
                query_scores.append(None)
                query_compression.append(0.0)
                if query_kept is not None:
                    query_kept.append([context_entry] if context_entry else [])
                if query_removed is not None:
                    query_removed.append([])
                query_titles.append(fallback_title)
                if query_sentence_probabilities is not None:
                    query_sentence_probabilities.append(context_sentence_probs or [])
                continue

            blocks = info["blocks"]
            raw_blocks = sorted(info["raw_blocks"], key=lambda x: x[0])

            if not blocks or not raw_blocks:
                query_pruned.append(context_entry)
                query_scores.append(None)
                query_compression.append(0.0)
                if query_kept is not None:
                    query_kept.append(info["sentences"])
                if query_removed is not None:
                    query_removed.append([])
                query_titles.append(fallback_title)
                if context_sentence_probs is not None:
                    context_sentence_probs.extend([1.0] * len(info["sentences"]))
                if query_sentence_probabilities is not None:
                    query_sentence_probabilities.append(context_sentence_probs or [])
                continue

            fragment_scores: dict[int, list[float]] = defaultdict(list)
            ranking_score: float | None = None
            prefix_counts = info.get("prefix_token_counts", [])

            for (_, raw), block in zip(raw_blocks, blocks):
                if raw.fragment_means is not None:
                    # Device-pooled fast path (engine guarantees no prefix
                    # offsets apply on this path).
                    for j, fragment in enumerate(block):
                        fragment_scores[fragment.global_index].append(
                            float(raw.fragment_means[j])
                        )
                else:
                    block_probs = raw.pruning_probs
                    ranges = raw.context_ranges
                    for fragment, (start, end) in zip(block, ranges):
                        # Prefix-token offset correction (standalone:3075-3081).
                        offset = sum(prefix_counts[: fragment.sentence_index])
                        start = max(0, start - offset)
                        end = max(start, end - offset)
                        end = min(end, len(block_probs))
                        start = min(start, len(block_probs))
                        mean_prob = (
                            1.0 if end <= start else float(block_probs[start:end].mean())
                        )
                        fragment_scores[fragment.global_index].append(mean_prob)

                if raw.ranking_score is not None:
                    if use_best_reranker_score:
                        if ranking_score is None:
                            ranking_score = raw.ranking_score
                        else:
                            ranking_score = max(ranking_score, raw.ranking_score)
                    else:
                        if ranking_score is None:
                            ranking_score = raw.ranking_score

            sentence_scores: dict[int, list[float]] = defaultdict(list)
            fragments: list[FragmentRecord] = info["fragments"]
            for fragment in fragments:
                if fragment.global_index in fragment_scores:
                    sentence_scores[fragment.sentence_index].extend(
                        fragment_scores[fragment.global_index]
                    )

            sentences = info["sentences"]
            prefix_len = info["prefix_length"]
            title_sentence_index: int | None = None
            sentence_keep_flags: list[bool] = []

            if always_select_title:
                if prefix_len > 0:
                    title_sentence_index = 0
                elif info.get("title_is_first_sentence") and len(sentences) > prefix_len:
                    title_sentence_index = prefix_len

            sentence_avg_probabilities: list[float] = []
            has_sentence_above_threshold = False
            for sentence_index in range(len(sentences)):
                probabilities = sentence_scores.get(sentence_index)
                avg_probability = float(np.mean(probabilities)) if probabilities else 0.0
                avg_probability = max(0.0, min(avg_probability, 1.0))
                sentence_avg_probabilities.append(avg_probability)
                if avg_probability > threshold:
                    has_sentence_above_threshold = True

            force_keep_title = (
                title_sentence_index is not None and has_sentence_above_threshold
            )

            for sentence_index in range(len(sentences)):
                avg_probability = sentence_avg_probabilities[sentence_index]
                keep_flag = avg_probability > threshold
                if force_keep_title and sentence_index == title_sentence_index:
                    keep_flag = True
                sentence_keep_flags.append(keep_flag)
                if context_sentence_probs is not None:
                    context_sentence_probs.append(avg_probability)

            kept_sentence_texts = [
                sentences[idx] for idx, keep in enumerate(sentence_keep_flags) if keep
            ]
            removed_sentence_texts = [
                sentences[idx] for idx, keep in enumerate(sentence_keep_flags) if not keep
            ]
            content_kept_sentences = [
                sentences[idx]
                for idx, keep in enumerate(sentence_keep_flags)
                if idx >= prefix_len and keep
            ]
            pruned_text = "".join(content_kept_sentences)
            original_text = info["original_text"]
            original_length = max(len(original_text), 1)
            compression = (
                (len(original_text) - len(pruned_text)) / original_length * 100.0
            )

            if zero_score_when_empty and not pruned_text.strip():
                ranking_score = 0.0

            prefix_sentences_value = info.get("prefix_sentences", [])
            if prefix_sentences_value:
                if len(prefix_sentences_value) == 1:
                    title_value: Any = prefix_sentences_value[0]
                else:
                    title_value = list(prefix_sentences_value)
            else:
                title_value = None

            query_pruned.append(pruned_text)
            query_scores.append(ranking_score)
            query_compression.append(compression)
            if query_kept is not None:
                query_kept.append(kept_sentence_texts)
            if query_removed is not None:
                query_removed.append(removed_sentence_texts)
            query_titles.append(title_value)
            if query_sentence_probabilities is not None:
                query_sentence_probabilities.append(context_sentence_probs or [])

        pruned_contexts.append(query_pruned)
        reranking_scores.append(query_scores)
        compression_rates.append(query_compression)
        if kept_sentences is not None and query_kept is not None:
            kept_sentences.append(query_kept)
        if removed_sentences is not None and query_removed is not None:
            removed_sentences.append(query_removed)
        title_values.append(query_titles)
        if sentence_probability_groups is not None and query_sentence_probabilities is not None:
            sentence_probability_groups.append(query_sentence_probabilities)

    return (
        pruned_contexts,
        reranking_scores,
        compression_rates,
        kept_sentences,
        removed_sentences,
        title_values,
        sentence_probability_groups,
    )


def apply_reordering(
    pruned_contexts,
    reranking_scores,
    compression_rates,
    kept_sentences,
    removed_sentences,
    title_values,
    sentence_probability_groups,
    *,
    top_k: int | None,
):
    """Sort contexts per query by descending reranker score; optional top_k
    (standalone:3204-3312)."""
    if not pruned_contexts:
        return (
            pruned_contexts,
            reranking_scores,
            compression_rates,
            kept_sentences,
            removed_sentences,
            title_values,
            sentence_probability_groups,
        )

    effective_top_k = None if top_k is None else max(0, int(top_k))

    r_pruned, r_scores, r_compr, r_titles = [], [], [], []
    r_kept = [] if kept_sentences is not None else None
    r_removed = [] if removed_sentences is not None else None
    r_probs = [] if sentence_probability_groups is not None else None

    for query_idx, scores in enumerate(reranking_scores):
        if not scores:
            r_pruned.append(pruned_contexts[query_idx])
            r_scores.append(scores)
            r_compr.append(compression_rates[query_idx])
            if r_kept is not None and kept_sentences is not None:
                r_kept.append(kept_sentences[query_idx])
            if r_removed is not None and removed_sentences is not None:
                r_removed.append(removed_sentences[query_idx])
            r_titles.append(title_values[query_idx])
            if r_probs is not None:
                r_probs.append(
                    sentence_probability_groups[query_idx]
                    if sentence_probability_groups is not None
                    else []
                )
            continue

        def _score_key(idx: int) -> float:
            value = scores[idx]
            return float("-inf") if value is None else float(value)

        ranking_indices = sorted(range(len(scores)), key=_score_key, reverse=True)
        limited = (
            ranking_indices if effective_top_k is None else ranking_indices[:effective_top_k]
        )

        r_pruned.append([pruned_contexts[query_idx][i] for i in limited])
        r_scores.append([scores[i] for i in limited])
        r_compr.append([compression_rates[query_idx][i] for i in limited])
        if r_kept is not None and kept_sentences is not None:
            r_kept.append([kept_sentences[query_idx][i] for i in limited])
        if r_removed is not None and removed_sentences is not None:
            r_removed.append([removed_sentences[query_idx][i] for i in limited])
        r_titles.append([title_values[query_idx][i] for i in limited])
        if r_probs is not None:
            r_probs.append(
                [sentence_probability_groups[query_idx][i] for i in limited]
                if sentence_probability_groups is not None
                else []
            )

    return r_pruned, r_scores, r_compr, r_kept, r_removed, r_titles, r_probs


def restore_output_shape(
    structure: str,
    pruned_contexts,
    reranking_scores,
    compression_rates,
    kept_sentences,
    removed_sentences,
    title_values,
    sentence_probability_groups,
) -> dict[str, Any]:
    """Collapse nested lists back to the caller's input shape
    (standalone:3740-3805)."""
    pruned_output: Any = pruned_contexts
    score_output: Any = reranking_scores
    compression_output: Any = compression_rates
    kept_output: Any = kept_sentences if kept_sentences is not None else None
    removed_output: Any = removed_sentences if removed_sentences is not None else None
    title_output: Any = title_values
    sentence_prob_output: Any = sentence_probability_groups

    if structure == "str" and pruned_contexts:
        pruned_output = pruned_contexts[0][0] if pruned_contexts[0] else ""
        score_output = reranking_scores[0][0] if reranking_scores[0] else None
        compression_output = compression_rates[0][0] if compression_rates[0] else 0.0
        if kept_sentences is not None:
            kept_output = kept_sentences[0][0] if kept_sentences[0] else []
        if removed_sentences is not None:
            removed_output = removed_sentences[0][0] if removed_sentences[0] else []
        title_output = title_values[0][0] if title_values[0] else None
        if (
            sentence_probability_groups is not None
            and sentence_probability_groups
            and sentence_probability_groups[0]
        ):
            sentence_prob_output = sentence_probability_groups[0][0]
    elif structure == "list" and pruned_contexts:
        pruned_output = pruned_contexts[0]
        score_output = reranking_scores[0]
        compression_output = compression_rates[0]
        if kept_sentences is not None:
            kept_output = kept_sentences[0]
        if removed_sentences is not None:
            removed_output = removed_sentences[0]
        title_output = title_values[0]
        if sentence_probability_groups is not None:
            sentence_prob_output = (
                sentence_probability_groups[0] if sentence_probability_groups else []
            )
    elif structure == "aligned" and pruned_contexts:
        pruned_output = [entry[0] if entry else "" for entry in pruned_contexts]
        score_output = [scores[0] if scores else None for scores in reranking_scores]
        compression_output = [rates[0] if rates else 0.0 for rates in compression_rates]
        if kept_sentences is not None:
            kept_output = [values[0] if values else [] for values in kept_sentences]
        if removed_sentences is not None:
            removed_output = [values[0] if values else [] for values in removed_sentences]
        title_output = [values[0] if values else None for values in title_values]
        if sentence_probability_groups is not None:
            sentence_prob_output = [
                values[0] if values else [] for values in sentence_probability_groups
            ]

    result: dict[str, Any] = {
        "pruned_context": pruned_output,
        "reranking_score": score_output,
        "compression_rate": compression_output,
        "title": title_output,
    }
    if kept_output is not None:
        result["kept_sentences"] = kept_output
    if removed_output is not None:
        result["removed_sentences"] = removed_output
    if sentence_prob_output is not None:
        result["sentence_probabilities"] = sentence_prob_output
    return result
