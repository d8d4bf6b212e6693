"""Dataset factory tests: converter (incl. golden vs reference pure
functions), span-relevance labeling with injected annotator + shard cache,
teacher scoring, frequency filtering, and the converter CLI subprocess run
(mirroring the reference's subprocess CLI test, SURVEY §4)."""

import subprocess
import sys
from pathlib import Path

import pytest
from datasets import Dataset, DatasetDict

from open_provence_tpu.datasets_factory import (
    ShardCache,
    add_teacher_scores,
    annotate_span_relevance,
    build_chunk_prompt,
    build_record,
    compute_split_size,
    convert_dataset_dict,
    ensure_eval_splits,
    extract_fields,
    frequency_filter_train,
    generic_sentence_splitter,
    parse_indices,
    text_to_spans,
    to_flags,
    truncate_content,
)

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference/scripts/context-relevance-datasets")
HAS_REFERENCE = REFERENCE.exists()


# --- converter ----------------------------------------------------------------


def test_extract_fields_variants():
    q, p, n = extract_fields({"query": "q", "positive": "p", "negative_1": "n1", "negative_2": "n2"})
    assert (q, p, n) == ("q", "p", ["n1", "n2"])
    q, p, n = extract_fields({"question": "q", "answer": "a"})
    assert (q, p, n) == ("q", "a", [])
    with pytest.raises(ValueError):
        extract_fields({"positive": "p"})
    with pytest.raises(ValueError):
        extract_fields({"query": "q"})


def test_text_to_spans_roundtrip():
    text = "First sentence. Second sentence! Third?"
    spans = text_to_spans(text, generic_sentence_splitter)
    assert len(spans) == 3
    for (s, e), expected in zip(spans, ["First sentence.", "Second sentence!", "Third?"]):
        assert text[s:e] == expected
    assert text_to_spans("", generic_sentence_splitter) == [[0, 0]]
    assert text_to_spans("   ", generic_sentence_splitter) == [[0, 0]]


def test_build_record_schema():
    record = build_record(
        {"query": "q?", "positive": "Pos one. Pos two.", "negative": "Neg."},
        splitter=generic_sentence_splitter, idx=3, dataset_slug="slug", split="train",
    )
    assert record["id"] == "slug:train:3"
    assert record["labels"] == [1, 0]
    assert len(record["context_spans"][0]) == 2


def test_compute_split_size_policy():
    assert compute_split_size(0) == 0
    assert compute_split_size(1) == 0
    assert compute_split_size(100) == 1
    assert compute_split_size(100000) == 1000
    assert compute_split_size(10_000_000) == 5000


def test_ensure_eval_splits():
    ds = Dataset.from_dict({"query": [f"q{i}" for i in range(50)],
                            "positive": [f"p{i}" for i in range(50)]})
    splits = ensure_eval_splits({"train": ds}, seed=0)
    assert set(splits) == {"train", "validation", "test"}
    assert len(splits["validation"]) >= 1 and len(splits["test"]) >= 1
    assert len(splits["train"]) + len(splits["validation"]) + len(splits["test"]) == 50


def test_convert_dataset_dict_end_to_end():
    rows = {
        "query": ["what is sushi?"] * 10,
        "positive": ["Sushi is food. It is Japanese."] * 10,
        "negative": ["Budgets are boring."] * 10,
    }
    converted = convert_dataset_dict(
        Dataset.from_dict(rows), language="en", dataset_slug="toy", sample_size=None
    )
    assert set(converted) == {"train", "validation", "test"}
    row = converted["train"][0]
    assert set(row) == {"id", "query", "texts", "context_spans", "labels"}
    assert row["labels"] == [1, 0]


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_text_to_spans():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_gen", REFERENCE / "generate_ds_from_sentense_transformer.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    texts = [
        "First sentence. Second sentence! Third?",
        "One line only",
        "",
        "  spaced.   out.  ",
    ]
    for text in texts:
        assert text_to_spans(text, generic_sentence_splitter) == ref.text_to_spans(
            text, ref.generic_sentence_splitter
        )
    cases = [
        {"query": "q", "positive": "p", "negative_1": "n1"},
        {"question": "q2", "answer": "a", "neg": "n"},
    ]
    for example in cases:
        assert extract_fields(example) == ref.extract_fields(example)


# --- labeling -----------------------------------------------------------------


def _labeled_dataset():
    return Dataset.from_dict(
        {
            "id": ["r0", "r1"],
            "query": ["about sushi", "about plants"],
            "texts": [["sushi rocks. boring budget."], ["plants need water. sushi aside."]],
            "context_spans": [[[[0, 12], [13, 27]]], [[[0, 18], [19, 31]]]],
        }
    )


def test_annotate_span_relevance_with_injected_annotator():
    def annotator(query, chunks):
        return [i for i, c in enumerate(chunks) if query.split()[-1] in c]

    ds = annotate_span_relevance(_labeled_dataset(), annotator)
    assert ds["context_spans_relevance"][0] == [[1, 0]]
    assert ds["context_spans_relevance"][1] == [[1, 0]]


def test_annotate_span_relevance_shard_cache(tmp_path):
    calls = {"n": 0}

    def annotator(query, chunks):
        calls["n"] += 1
        return [0]

    cache = ShardCache(tmp_path, shard_size=10)
    ds = _labeled_dataset()
    annotate_span_relevance(ds, annotator, cache=cache)
    first_calls = calls["n"]
    assert first_calls == 2
    # Second run resumes entirely from cache — no annotator calls.
    annotate_span_relevance(ds, annotator, cache=ShardCache(tmp_path, shard_size=10))
    assert calls["n"] == first_calls


def test_chunk_prompt_and_index_parsing():
    prompt = build_chunk_prompt("q?", ["aaa", "bbb"])
    assert "[1] aaa" in prompt and "[2] bbb" in prompt
    assert parse_indices("relevant: [1] and [3]", 3) == [0, 2]
    assert parse_indices("7 42", 3) == []
    assert to_flags([0, 2], 3) == [1, 0, 1]
    q, chunks = truncate_content("x" * 500, ["c" * 500] * 20, iteration=1)
    assert len(q) == 100 and len(chunks) == 10 and len(chunks[0]) == 203


def test_add_teacher_scores():
    def predict(pairs):
        return [float(len(t)) for _, t in pairs]

    ds = add_teacher_scores(_labeled_dataset(), predict, teacher_name="toy")
    col = ds["teacher_scores.toy"]
    assert col[0] == [float(len(_labeled_dataset()["texts"][0][0]))]
    assert len(col) == 2


# --- frequency filter -----------------------------------------------------------


def test_frequency_filter_train():
    ds = Dataset.from_dict(
        {
            "id": [f"r{i}" for i in range(4)],
            "texts": [["a", "b"], ["a", "c"], ["a", "b"], ["d", "e"]],
        }
    )
    # threshold 1: r0 kept (0 dups), r1 kept (1 dup: a), r2 dropped (2 dups), r3 kept.
    filtered, stats, dropped = frequency_filter_train(ds, 1)
    assert dropped == {"r2"}
    assert stats.rows_kept == 3 and stats.rows_removed == 1
    assert stats.duplicate_buckets_removed == {2: 1}
    # threshold 0: r1 also dropped.
    _, stats0, dropped0 = frequency_filter_train(ds, 0)
    assert dropped0 == {"r1", "r2"}


# --- converter CLI subprocess ---------------------------------------------------


@pytest.mark.slow
def test_converter_cli_subprocess(tmp_path):
    source = DatasetDict(
        {
            "train": Dataset.from_dict(
                {
                    "query": [f"question {i} ?" for i in range(12)],
                    "positive": [f"Positive answer {i}. Extra detail." for i in range(12)],
                    "negative": [f"Negative text {i}." for i in range(12)],
                }
            )
        }
    )
    src_path = tmp_path / "src"
    source.save_to_disk(str(src_path))
    out_path = tmp_path / "converted"
    result = subprocess.run(
        [
            sys.executable,
            str(REPO_ROOT / "scripts/context_relevance_datasets/generate_ds_from_sentence_transformer.py"),
            "--dataset", str(src_path),
            "--lang", "en",
            "--output-dir", str(out_path),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr
    from datasets import load_from_disk

    converted = load_from_disk(str(out_path))
    assert set(converted.keys()) == {"train", "validation", "test"}
    assert converted["train"].column_names == ["id", "query", "texts", "context_spans", "labels"]
