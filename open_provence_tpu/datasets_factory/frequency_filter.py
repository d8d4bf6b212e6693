"""Duplicate-text frequency filtering — the source of the "freq2" subsets.

Counterpart of scripts/context-relevance-datasets/frequency_filter_ds.py:
rows whose texts repeat already-seen MD5 fingerprints more than
``threshold`` times are dropped; duplicate-bucket statistics are reported.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from dataclasses import dataclass
from typing import Any

from datasets import Dataset


@dataclass
class DuplicateStats:
    rows_total: int
    rows_kept: int
    rows_removed: int
    texts_total: int
    texts_unique: int
    texts_duplicates: int
    texts_dup_ratio: float
    duplicate_buckets_total: dict[int, int]
    duplicate_buckets_kept: dict[int, int]
    duplicate_buckets_removed: dict[int, int]

    def to_dict(self) -> dict[str, Any]:
        return dict(self.__dict__)


def frequency_filter_train(
    dataset: Dataset,
    threshold: int,
    *,
    id_column: str = "id",
    texts_column: str = "texts",
) -> tuple[Dataset, DuplicateStats, set[str]]:
    """Keep a row only when at most ``threshold`` of its texts were already
    seen in kept rows (reference frequency_filter_ds.py:114-199)."""
    if threshold < 0:
        raise ValueError("Threshold must be non-negative.")

    global_counter: Counter[str] = Counter()
    seen_counter: Counter[str] = Counter()
    bucket_total: Counter[int] = Counter()
    bucket_kept: Counter[int] = Counter()
    bucket_removed: Counter[int] = Counter()
    drop_ids: set[str] = set()

    for row_idx, row in enumerate(dataset):
        texts = list(row[texts_column])
        md5_list = [hashlib.md5(str(t).encode("utf-8")).hexdigest() for t in texts]
        for md5 in md5_list:
            global_counter[md5] += 1
        dup_count = sum(1 for md5 in md5_list if seen_counter[md5] > 0)
        bucket_total[dup_count] += 1
        if dup_count > threshold:
            drop_ids.add(str(row.get(id_column, row_idx)))
            bucket_removed[dup_count] += 1
            continue
        bucket_kept[dup_count] += 1
        for md5 in md5_list:
            seen_counter[md5] += 1

    filtered = dataset.filter(
        lambda row, idx: str(row.get(id_column, idx)) not in drop_ids,
        with_indices=True,
    )

    texts_total = sum(global_counter.values())
    texts_unique = len(global_counter)
    stats = DuplicateStats(
        rows_total=len(dataset),
        rows_kept=len(filtered),
        rows_removed=len(dataset) - len(filtered),
        texts_total=texts_total,
        texts_unique=texts_unique,
        texts_duplicates=texts_total - texts_unique,
        texts_dup_ratio=(texts_total - texts_unique) / texts_total if texts_total else 0.0,
        duplicate_buckets_total=dict(bucket_total),
        duplicate_buckets_kept=dict(bucket_kept),
        duplicate_buckets_removed=dict(bucket_removed),
    )
    return filtered, stats, drop_ids
