"""Eval harness tests: metric math (golden vs reference pure functions),
end-to-end run_evaluation with a tiny model, CLI subprocess-free wiring."""

import json
import sys
from pathlib import Path

import pytest

from open_provence_tpu.eval.datasets_eval import (
    EvalConfig,
    build_markdown,
    evaluate_dataset,
    extract_sentences,
    infer_predictions,
    normalize_relevance,
    run_evaluation,
)

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = (REFERENCE_ROOT / "scripts").exists()


def test_normalize_relevance_mask_and_indices():
    assert normalize_relevance([1, 0, 1], 3) == [1, 0, 1]
    assert normalize_relevance([0, 2], 3) == [1, 0, 1]
    assert normalize_relevance(None, 2) == [0, 0]
    assert normalize_relevance([5], 3) == [0, 0, 0]
    assert normalize_relevance([], 0) == []


def test_extract_sentences_spans():
    text = "abcdef"
    assert extract_sentences(text, [[0, 3], [3, 6]]) == ["abc", "def"]
    assert extract_sentences(text, [[4, 2]]) == [""]
    assert extract_sentences(text, []) == ["abcdef"]
    assert extract_sentences("", []) == []


def test_infer_predictions_prefix_matching():
    sentences = ["aaa", "bbb", "ccc"]
    assert infer_predictions(sentences, "aaaccc", 3) == [1, 0, 1]
    assert infer_predictions(sentences, "", 3) == [0, 0, 0]
    assert infer_predictions(sentences, "aaabbbccc", 3) == [1, 1, 1]
    assert infer_predictions(sentences, "x", 0) == []


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_eval_helpers():
    sys.path.insert(0, str(REFERENCE_ROOT))
    sys.path.insert(0, str(REFERENCE_ROOT / "scripts"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_eval_datasets", REFERENCE_ROOT / "scripts" / "eval_datasets.py"
    )
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as exc:  # import-heavy module may fail offline
        pytest.skip(f"reference eval_datasets not importable: {exc}")

    cases_rel = [([1, 0, 1], 3), ([0, 2], 3), (None, 2), ([], 0), ([1, 1], 2)]
    for values, count in cases_rel:
        assert normalize_relevance(values, count) == ref._normalize_relevance(values, count)

    text = "abcdefghij"
    for spans in [[[0, 3], [3, 6]], [], [[2, 2]], [[0, 100]]]:
        assert extract_sentences(text, spans) == ref._extract_sentences(text, spans)

    sentences = ["aa", "bb", "cc"]
    for pruned in ["aabbcc", "aacc", "", "bb", "aab"]:
        assert infer_predictions(sentences, pruned, 3) == ref._infer_predictions(
            sentences, pruned, 3
        )


@pytest.fixture(scope="module")
def tiny_model():
    from tests.test_process_engine import _tiny_model

    return _tiny_model()


def _eval_rows():
    return {
        "query": ["what about sushi?", "another question"],
        "texts": [
            ["First span here. Second span there. Third span everywhere."],
            ["Alpha text. Beta text."],
        ],
        "context_spans": [
            [[[0, 17], [17, 36], [36, 59]]],
            [[[0, 12], [12, 22]]],
        ],
        "context_spans_relevance": [[[1, 0, 1]], [[0, 1]]],
    }


def test_evaluate_dataset_threshold_extremes(tiny_model):
    from datasets import Dataset

    dataset = Dataset.from_dict(_eval_rows())
    # threshold 0 → everything kept → predictions all 1 → recall 1.
    metrics = evaluate_dataset(tiny_model, dataset, threshold=0.0, batch_size=8)
    assert metrics["recall"] == 1.0
    assert metrics["confusion_matrix"]["fn"] == 0
    assert metrics["span_total"] == 5
    assert metrics["mean_compression"] == 0.0
    # threshold 1 → everything pruned → no predicted positives.
    metrics = evaluate_dataset(tiny_model, dataset, threshold=1.0, batch_size=8)
    assert metrics["confusion_matrix"]["tp"] == 0
    assert metrics["precision"] is None
    assert metrics["recall"] == 0.0
    assert metrics["f2"] is None


def test_run_evaluation_end_to_end(tiny_model, tmp_path):
    from datasets import Dataset, DatasetDict

    ds = DatasetDict({"test": Dataset.from_dict(_eval_rows())})
    ds_path = tmp_path / "toy_eval_ds"
    ds.save_to_disk(str(ds_path))

    config_path = tmp_path / "eval.yaml"
    config_path.write_text(
        f"split: test\ndatasets:\n  - dataset_name: {ds_path}\n    n_samples: 2\n"
    )

    result = run_evaluation(
        tiny_model,
        EvalConfig.load(config_path),
        model_name="tiny",
        config_path=str(config_path),
        thresholds=[0.0, 1.0],
        batch_size=4,
        output_file=tmp_path / "report.md",
        output_json=tmp_path / "report.json",
    )
    markdown = (tmp_path / "report.md").read_text()
    assert "### Threshold 0" in markdown
    assert "### Threshold 1" in markdown
    assert "F2 Score" in markdown
    payload = json.loads((tmp_path / "report.json").read_text())
    assert "results" in payload and "0" in payload["results"]
    key = next(iter(payload["results"]["0"]))
    assert payload["results"]["0"][key]["recall"] == 1.0
    assert result["metadata"]["total_process_time_seconds"] > 0


def test_build_markdown_empty():
    md = build_markdown(
        {
            "timestamp_utc": "t",
            "model": "m",
            "config": "c",
            "batch_size": 4,
            "total_process_time_seconds": 0.0,
            "thresholds": [0.1],
            "datasets": [],
            "per_threshold_process_time_seconds": {},
        },
        {0.1: {}},
    )
    assert "(no datasets)" in md
