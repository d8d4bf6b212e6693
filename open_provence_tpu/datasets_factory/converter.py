"""Triplet → Provence-format dataset conversion.

Library form of the reference's
scripts/context-relevance-datasets/generate_ds_from_sentense_transformer.py:
(query, positive, negatives…) rows → {id, query, texts, context_spans,
labels}, with per-language sentence splitters (punkt for 16 languages when
its data is present, regex fallback otherwise; ja handled by the package's
regex splitter since fast-bunkai is Rust-only) and the 1%/≤5k automatic
validation/test split policy.
"""

from __future__ import annotations

import logging
import re
from collections.abc import Callable
from typing import Any, cast

from datasets import Dataset, DatasetDict

from ..text.splitters import japanese_sentence_splitter

logger = logging.getLogger(__name__)

SentenceSplitter = Callable[[str], list[str]]

NLTK_PUNKT_LANG_CODES = {
    "da": "danish", "de": "german", "en": "english", "es": "spanish",
    "et": "estonian", "fi": "finnish", "fr": "french", "el": "greek",
    "it": "italian", "nb": "norwegian", "nl": "dutch", "pl": "polish",
    "pt": "portuguese", "sl": "slovene", "sv": "swedish", "tr": "turkish",
}
_ALIASES: dict[str, str] = {}
for code, name in NLTK_PUNKT_LANG_CODES.items():
    _ALIASES[code] = name
    _ALIASES[name] = name
_ALIASES.update({"no": "norwegian", "nn": "norwegian"})

_GENERIC_SPLIT_PATTERN = re.compile(r".+?(?:[.!?。！？]+(?:\s+|$)|\n+|$)", re.S)


def generic_sentence_splitter(text: str) -> list[str]:
    sentences = [m.strip() for m in _GENERIC_SPLIT_PATTERN.findall(text) if m.strip()]
    if sentences:
        return sentences
    stripped = text.strip()
    return [stripped] if stripped else []


def _punkt_splitter(language_name: str) -> SentenceSplitter | None:
    try:
        import nltk

        tokenizer = nltk.data.load(f"tokenizers/punkt/{language_name}.pickle")
    except Exception:
        return None

    def _split(text: str) -> list[str]:
        return [s for s in tokenizer.tokenize(text) if s.strip()]

    return _split


def resolve_factory_splitter(language: str) -> SentenceSplitter:
    canonical = language.lower()
    if canonical == "ja":
        return lambda text: [s.strip() for s in japanese_sentence_splitter(text) if s.strip()]
    name = _ALIASES.get(canonical)
    if name is not None:
        punkt = _punkt_splitter(name)
        if punkt is not None:
            return punkt
        logger.warning(
            "punkt data for '%s' unavailable; using regex fallback splitter.", name
        )
        return generic_sentence_splitter
    logger.warning(
        "No splitter registered for language '%s'; using regex fallback.", canonical
    )
    return generic_sentence_splitter


def text_to_spans(text: str, splitter: SentenceSplitter) -> list[list[int]]:
    """Char spans of the splitter's (stripped) sentences inside the text
    (reference generate_ds:158-195)."""
    sentences = splitter(text)
    spans: list[list[int]] = []
    cursor = 0
    for sentence in sentences:
        stripped = sentence.strip()
        if not stripped:
            continue
        start = text.find(stripped, cursor)
        if start == -1:
            start = text.find(stripped)
        if start == -1:
            continue
        end = start + len(stripped)
        spans.append([start, end])
        cursor = end
    if spans:
        return spans
    stripped = text.strip()
    if not stripped:
        return [[0, 0]]
    start = max(text.find(stripped), 0)
    return [[start, start + len(stripped)]]


def _normalise_text(value: Any) -> str:
    if value is None:
        return ""
    if isinstance(value, list):
        return " ".join(str(part) for part in value if part)
    if isinstance(value, str):
        return value
    return str(value)


def extract_fields(example: dict[str, Any]) -> tuple[str, str, list[str]]:
    """query/question/prompt + answer/positive/pos/target + negative*
    (reference generate_ds:198-222)."""
    query = _normalise_text(
        example.get("query") or example.get("question") or example.get("prompt")
    )
    if not query:
        raise ValueError("Example does not contain a query/question field.")
    positive = _normalise_text(
        example.get("answer")
        or example.get("positive")
        or example.get("pos")
        or example.get("target")
    )
    if not positive:
        raise ValueError("Example does not contain an answer/positive field.")
    negative_fields = sorted(
        key
        for key in example
        if isinstance(key, str) and (key.startswith("negative") or key.startswith("neg"))
    )
    negatives = [
        value for field in negative_fields if (value := _normalise_text(example.get(field)))
    ]
    return query, positive, negatives


def slugify_dataset_name(name: str, subset: str | None) -> str:
    base = name.replace("/", "_")
    return f"{base}_{subset}" if subset else base


def build_record(
    example: dict[str, Any], *, splitter: SentenceSplitter, idx: int,
    dataset_slug: str, split: str,
) -> dict[str, Any]:
    query, positive, negatives = extract_fields(example)
    texts = [positive, *negatives]
    return {
        "id": f"{dataset_slug}:{split}:{idx}",
        "query": query,
        "texts": texts,
        "context_spans": [text_to_spans(text, splitter) for text in texts],
        "labels": [1] + [0] * (len(texts) - 1),
    }


def convert_split(
    dataset: Dataset, *, splitter: SentenceSplitter, dataset_slug: str, split: str
) -> Dataset:
    records = [
        build_record(
            cast(dict[str, Any], example),
            splitter=splitter,
            idx=idx,
            dataset_slug=dataset_slug,
            split=split,
        )
        for idx, example in enumerate(dataset)
    ]
    if not records:
        return Dataset.from_dict(
            {"id": [], "query": [], "texts": [], "context_spans": [], "labels": []}
        )
    return Dataset.from_list(records)


def compute_split_size(total_rows: int) -> int:
    """1% of rows, capped at 5000 (reference generate_ds:367-375)."""
    if total_rows <= 1:
        return 0
    desired = min(max(1, int(round(total_rows * 0.01))), 5000)
    max_for_split = max(total_rows - 1, 0)
    if max_for_split <= 1:
        return min(desired, max_for_split)
    return min(desired, max_for_split // 2)


def ensure_eval_splits(splits: dict[str, Dataset], seed: int) -> dict[str, Dataset]:
    """Create validation/test from train when absent (reference
    generate_ds:360-411)."""
    if "validation" in splits and "test" in splits:
        return splits
    train_split = splits["train"].shuffle(seed=seed)
    total = len(train_split)
    if total == 0:
        raise ValueError("Train split is empty; cannot create validation/test splits.")
    val_size = compute_split_size(total)
    if val_size == 0 and total > 1:
        val_size = 1
    remaining = total - val_size
    test_size = compute_split_size(remaining)
    if test_size == 0 and remaining > 1:
        test_size = 1
    if total - val_size - test_size <= 0:
        shortfall = 1 - (total - val_size - test_size)
        if test_size > shortfall:
            test_size -= shortfall
        elif val_size > shortfall:
            val_size -= shortfall
        else:
            raise ValueError("Unable to allocate positive split sizes.")
    out = dict(splits)
    out["validation"] = train_split.select(range(val_size))
    out["test"] = train_split.select(range(val_size, val_size + test_size))
    out["train"] = train_split.select(range(val_size + test_size, total))
    return out


def convert_dataset_dict(
    dataset_dict: DatasetDict | Dataset,
    *,
    language: str,
    dataset_slug: str,
    sample_size: int | None = None,
    seed: int = 42,
) -> DatasetDict:
    if isinstance(dataset_dict, Dataset):
        dataset_dict = DatasetDict({"train": dataset_dict})
    if "train" not in dataset_dict:
        raise ValueError("Source dataset must expose a 'train' split.")
    splitter = resolve_factory_splitter(language)

    splits: dict[str, Dataset] = {}
    for split_name, split_dataset in dataset_dict.items():
        if sample_size is not None:
            if sample_size <= 0:
                raise ValueError("sample_size must be positive if provided.")
            split_dataset = split_dataset.shuffle(seed=seed).select(
                range(min(sample_size, len(split_dataset)))
            )
        splits[split_name] = split_dataset

    splits = ensure_eval_splits(splits, seed)
    return DatasetDict(
        {
            name: convert_split(
                ds, splitter=splitter, dataset_slug=dataset_slug, split=name
            )
            for name, ds in splits.items()
        }
    )
