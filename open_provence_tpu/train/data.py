"""Dataset preparation ops (host-side, HF ``datasets``).

Ports the reference's training data path (open_provence/trainer.py:591-1237):
zero-relevance filtering, positives-first item sampling with deterministic
per-row rng, upsampling, multi-dataset concatenation on common columns, and
validation splits.
"""

from __future__ import annotations

import logging
import math
import random
from pathlib import Path
from typing import Any, cast

from datasets import Dataset, DatasetDict, concatenate_datasets, load_dataset, load_from_disk

logger = logging.getLogger(__name__)


def load_dataset_dict(dataset_name: str | None, subset: str | None) -> DatasetDict:
    """Hub ID or local save_to_disk directory (reference trainer.py:104-121)."""
    if dataset_name:
        dataset_path = Path(dataset_name).expanduser()
        if dataset_path.exists():
            logger.info("Loading local dataset from %s", dataset_path)
            return cast(DatasetDict, load_from_disk(str(dataset_path)))
    return cast(DatasetDict, load_dataset(dataset_name or "", subset or None))


def sample_dataset_randomly(
    dataset: Dataset, sample_size: int, rnd: random.Random, dataset_label: str
) -> Dataset:
    """(reference trainer.py:124-152)"""
    if sample_size <= 0:
        raise ValueError("sample_size must be greater than 0")
    dataset_length = len(dataset)
    if dataset_length <= sample_size:
        return dataset
    indices = sorted(rnd.sample(range(dataset_length), sample_size))
    logger.info(
        "Sampled %s/%s rows from %s", sample_size, dataset_length, dataset_label
    )
    return cast(Dataset, dataset.select(indices))


def filter_pruning_dataset(
    dataset: Dataset,
    max_items: int,
    num_proc: int | None = None,
    reverse_sort: bool = False,
    keep_first: bool = False,
) -> Dataset:
    """Drop zero-relevance items, cap items per row by mean relevance, drop
    short rows (reference trainer.py:591-703)."""
    initial_size = len(dataset)

    def filter_and_limit_items(example: dict[str, Any]) -> dict[str, Any]:
        relevance = example.get("context_spans_relevance", [])
        if not relevance:
            return example
        original_length = len(relevance)
        indices_to_keep: list[int] = []
        if keep_first and len(relevance) > 0:
            indices_to_keep.append(0)
            start_idx = 1
            remaining_slots = max_items - 1
        else:
            start_idx = 0
            remaining_slots = max_items

        items_with_avg: list[tuple[int, float]] = []
        for i in range(start_idx, len(relevance)):
            item = relevance[i]
            if isinstance(item, list):
                avg_relevance = sum(item) / len(item) if len(item) > 0 else 0
                if any(r != 0 for r in item):
                    items_with_avg.append((i, avg_relevance))
            else:
                if item != 0:
                    items_with_avg.append((i, item))

        if remaining_slots > 0:
            items_with_avg.sort(key=lambda x: x[1], reverse=not reverse_sort)
            indices_to_keep.extend([idx for idx, _ in items_with_avg[:remaining_slots]])
        indices_to_keep.sort()

        fields_to_filter = [
            name
            for name, value in example.items()
            if isinstance(value, list) and len(value) == original_length
        ]
        for field_name in fields_to_filter:
            example[field_name] = [
                example[field_name][i]
                for i in indices_to_keep
                if i < len(example[field_name])
            ]
        return example

    dataset = cast(Dataset, dataset.map(filter_and_limit_items, num_proc=num_proc))

    def has_at_least_n_items(example: dict[str, Any]) -> bool:
        relevance = example.get("context_spans_relevance", [])
        return len(relevance) >= max_items

    dataset = cast(Dataset, dataset.filter(has_at_least_n_items, num_proc=num_proc))
    final_size = len(dataset)
    logger.info(
        "filter_pruning_dataset: %s → %s rows (%.1f%% retained)",
        initial_size,
        final_size,
        final_size / max(initial_size, 1) * 100,
    )
    return dataset


def sample_items_by_label_priority(
    dataset: Dataset,
    max_items: int,
    seed: int,
    *,
    label_column: str = "labels",
    num_proc: int | None = None,
) -> Dataset:
    """Positives-first capped sampling with deterministic per-row rng
    seed+idx (reference trainer.py:706-867)."""
    if max_items <= 0:
        raise ValueError("items must be a positive integer")

    label_column_present = label_column in dataset.column_names
    sample_reference_column: str | None = None
    if not label_column_present:
        for candidate in ["texts", "context_spans", "context", "passages"]:
            if candidate in dataset.column_names:
                sample_reference_column = candidate
                break
        if sample_reference_column is None:
            first_row = dataset[0] if len(dataset) else {}
            for name, value in first_row.items():
                if isinstance(value, list):
                    sample_reference_column = name
                    break
        if sample_reference_column is None:
            logger.warning(
                "Could not find a list column for 'items' sampling without '%s'. Skipping.",
                label_column,
            )
            return dataset

    def sample_and_limit(example: dict[str, Any], idx: int) -> dict[str, Any]:
        reference_column = label_column if label_column_present else sample_reference_column
        labels = example.get(label_column) if label_column_present else None
        if label_column_present and isinstance(labels, list):
            original_length = len(labels)
        else:
            reference_values = example.get(reference_column) if reference_column else None
            if not isinstance(reference_values, list):
                return example
            original_length = len(reference_values)
        if original_length == 0:
            return example

        if label_column_present and isinstance(labels, list):
            positive_indices = [i for i, v in enumerate(labels) if v == 1]
            negative_indices = [i for i, v in enumerate(labels) if v != 1]
            selected: list[int] = []
            if positive_indices:
                selected.extend(positive_indices[:max_items])
            remaining_slots = max_items - len(selected)
            if remaining_slots > 0:
                candidates = (
                    negative_indices if positive_indices else list(range(original_length))
                )
                rng = random.Random(seed + idx)
                rng.shuffle(candidates)
                selected.extend(candidates[:remaining_slots])
        else:
            rng = random.Random(seed + idx)
            candidates = list(range(original_length))
            rng.shuffle(candidates)
            selected = candidates[:max_items]

        selected = sorted(set(i for i in selected if i < original_length))
        fields_to_filter = [
            name
            for name, value in example.items()
            if isinstance(value, list) and len(value) == original_length
        ]
        for field_name in fields_to_filter:
            example[field_name] = [example[field_name][i] for i in selected]
        return example

    dataset = cast(
        Dataset, dataset.map(sample_and_limit, with_indices=True, num_proc=num_proc)
    )

    def has_required_items(example: dict[str, Any]) -> bool:
        if label_column_present:
            labels = example.get(label_column, [])
            return isinstance(labels, list) and len(labels) >= max_items
        reference_values = example.get(sample_reference_column, [])
        return isinstance(reference_values, list) and len(reference_values) >= max_items

    return cast(Dataset, dataset.filter(has_required_items, num_proc=num_proc))


def upsample_dataset(
    dataset: Dataset,
    multiplier: float,
    *,
    seed: int,
    dataset_label: str | None = None,
) -> Dataset:
    """Duplicate rows (whole copies + deterministic fractional tail)
    (reference trainer.py:870-935)."""
    if multiplier < 1.0:
        raise ValueError("upsample_factor must be >= 1.0")
    base_size = len(dataset)
    if base_size == 0 or multiplier <= 1.0:
        return dataset

    whole_copies = int(multiplier)
    fractional = multiplier - whole_copies
    pieces: list[Dataset] = []
    if whole_copies > 0:
        pieces.extend([dataset] * whole_copies)
    if fractional > 1e-6:
        take = int(round(fractional * base_size))
        take = max(1, min(take, base_size))
        tail = dataset.shuffle(seed=seed).select(range(take))
        pieces.append(tail)
    if not pieces:
        return dataset
    upsampled = concatenate_datasets(pieces)
    logger.info(
        "Upsampled %s from %s to %s rows (factor=%.3f)",
        dataset_label or "dataset",
        base_size,
        len(upsampled),
        multiplier,
    )
    return upsampled


def prepare_dataset(data_args: Any, seed: int = 42) -> tuple[Dataset, Dataset | None]:
    """Load + filter + sample + concat + validation split
    (reference trainer.py:938-1237). ``data_args`` is the DataArguments
    dataclass from train.config."""
    if data_args.datasets:
        datasets_to_load = data_args.datasets
    else:
        teacher_column = data_args.teacher_column or "teacher_score"
        datasets_to_load = [
            {
                "dataset_name": data_args.dataset_name,
                "subset": data_args.subset,
                "teacher_column": teacher_column,
                **({"items": data_args.items} if data_args.items is not None else {}),
                **(
                    {"upsample_factor": data_args.upsample_factor}
                    if data_args.upsample_factor is not None
                    else {}
                ),
            }
        ]

    train_datasets: list[Dataset] = []
    eval_datasets: list[Dataset] = []
    rnd = random.Random(seed)
    num_proc = data_args.preprocessing_num_workers

    for dataset_config in datasets_to_load:
        dataset_name = dataset_config.get("dataset_name")
        subset = dataset_config.get("subset")
        teacher_column = dataset_config.get("teacher_column", "teacher_score")
        items_per_query = dataset_config.get("items", data_args.items)
        upsample_factor = dataset_config.get("upsample_factor", data_args.upsample_factor)
        sample_size = dataset_config.get("n_samples")
        dataset_id = f"{dataset_name}:{subset}" if dataset_name else subset or "train"
        train_sampling_ratio: float | None = None

        dataset = load_dataset_dict(dataset_name, subset)
        train_ds = cast(Dataset, dataset["train"])

        if data_args.filter_zero_relevance_max_items is not None:
            train_ds = filter_pruning_dataset(
                train_ds,
                data_args.filter_zero_relevance_max_items,
                num_proc=num_proc,
                reverse_sort=data_args.filter_zero_relevance_max_items_reverse,
                keep_first=data_args.filter_keep_first_item,
            )
        if items_per_query is not None:
            train_ds = sample_items_by_label_priority(
                train_ds, items_per_query, seed=seed, num_proc=num_proc
            )
        if teacher_column != "teacher_score" and teacher_column in train_ds.column_names:
            train_ds = cast(Dataset, train_ds.rename_column(teacher_column, "teacher_score"))
        if upsample_factor is not None:
            train_ds = upsample_dataset(
                train_ds, float(upsample_factor), seed=seed,
                dataset_label=f"{dataset_id} train",
            )
        if sample_size is not None:
            sample_size_value = float(sample_size)
            if sample_size_value <= 0:
                raise ValueError("n_samples must be greater than 0")
            pre_sample_size = len(train_ds)
            if sample_size_value <= 1:
                target_count = max(1, math.ceil(pre_sample_size * sample_size_value))
            else:
                target_count = int(sample_size_value)
            target_count = min(pre_sample_size, target_count)
            train_ds = sample_dataset_randomly(
                train_ds, target_count, rnd, dataset_label=f"{dataset_id} train"
            )
            train_sampling_ratio = (
                len(train_ds) / pre_sample_size if pre_sample_size > 0 else 1.0
            )
        train_datasets.append(train_ds)

        eval_split = None
        if data_args.validation_split_name in dataset:
            eval_split = data_args.validation_split_name
        elif "validation" in dataset:
            eval_split = "validation"
        elif "test" in dataset:
            eval_split = "test"
        if eval_split:
            eval_ds = cast(Dataset, dataset[eval_split])
            if data_args.filter_zero_relevance_max_items is not None:
                eval_ds = filter_pruning_dataset(
                    eval_ds,
                    data_args.filter_zero_relevance_max_items,
                    num_proc=num_proc,
                    reverse_sort=data_args.filter_zero_relevance_max_items_reverse,
                    keep_first=data_args.filter_keep_first_item,
                )
            if items_per_query is not None:
                eval_ds = sample_items_by_label_priority(
                    eval_ds, items_per_query, seed=seed, num_proc=num_proc
                )
            if teacher_column != "teacher_score" and teacher_column in eval_ds.column_names:
                eval_ds = cast(Dataset, eval_ds.rename_column(teacher_column, "teacher_score"))
            if sample_size is not None and train_sampling_ratio is not None and len(eval_ds) > 0:
                eval_sample_size = min(
                    len(eval_ds), max(1, math.ceil(len(eval_ds) * train_sampling_ratio))
                )
                eval_ds = sample_dataset_randomly(
                    eval_ds, eval_sample_size, rnd, dataset_label=f"{dataset_id} {eval_split}"
                )
            eval_datasets.append(eval_ds)

    if len(train_datasets) > 1:
        common_columns = set(train_datasets[0].column_names)
        for ds in train_datasets[1:]:
            common_columns &= set(ds.column_names)
        essential = ["query", "positive", "negative", "teacher_score"]
        context_cols = ["context_spans", "context_spans_relevance"]
        existing_columns = [c for c in essential if c in common_columns]
        existing_columns += [c for c in context_cols if c in common_columns]
        existing_columns += [
            c for c in sorted(common_columns) if c not in existing_columns
        ]
        train_datasets = [ds.select_columns(existing_columns) for ds in train_datasets]
        train_dataset = concatenate_datasets(train_datasets)
        if eval_datasets:
            eval_datasets = [
                ds.select_columns(existing_columns)
                for ds in eval_datasets
                if all(col in ds.column_names for col in existing_columns)
            ]
            eval_dataset = concatenate_datasets(eval_datasets) if eval_datasets else None
        else:
            eval_dataset = None
    else:
        train_dataset = train_datasets[0]
        eval_dataset = eval_datasets[0] if eval_datasets else None

    if eval_dataset is None and (
        data_args.validation_split is not None
        or data_args.validation_split_samples is not None
    ):
        if data_args.validation_split_samples is not None:
            if (
                data_args.validation_split_samples <= 0
                or data_args.validation_split_samples >= len(train_dataset)
            ):
                raise ValueError(
                    f"validation_split_samples must be between 1 and {len(train_dataset) - 1}"
                )
            ratio = data_args.validation_split_samples / len(train_dataset)
        else:
            if data_args.validation_split is None or not (
                0 < data_args.validation_split < 1
            ):
                raise ValueError("validation_split must be between 0 and 1")
            ratio = data_args.validation_split
        split_dataset = train_dataset.train_test_split(test_size=ratio, seed=seed)
        train_dataset = split_dataset["train"]
        eval_dataset = split_dataset["test"]

    if data_args.max_train_samples and len(train_dataset) > data_args.max_train_samples:
        train_dataset = train_dataset.select(range(data_args.max_train_samples))
    if (
        eval_dataset is not None
        and data_args.max_eval_samples
        and len(eval_dataset) > data_args.max_eval_samples
    ):
        eval_dataset = eval_dataset.select(range(data_args.max_eval_samples))

    logger.info(
        "Final dataset sizes: train=%s validation=%s",
        len(train_dataset),
        len(eval_dataset) if eval_dataset is not None else 0,
    )
    return train_dataset, eval_dataset


def batch_iterator(
    dataset: Dataset,
    collator: Any,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 42,
    epoch: int = 0,
    drop_last: bool = True,
):
    """Yield collated fixed-shape batches."""
    indices = list(range(len(dataset)))
    if shuffle:
        random.Random(seed + epoch).shuffle(indices)
    for start in range(0, len(indices), batch_size):
        chunk = indices[start : start + batch_size]
        if drop_last and len(chunk) < batch_size:
            break
        features = [dataset[int(i)] for i in chunk]
        yield collator(features)
