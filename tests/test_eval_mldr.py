"""MLDR eval tests: record building with a fake process fn (mirroring the
reference's test_eval_mldr_official.py approach), judge payload parsing,
ignore-list filtering, full two-stage CLI run with a fake judge."""

import asyncio
import json
from pathlib import Path

import pytest

from open_provence_tpu.eval.mldr_eval import (
    JudgeConfig,
    build_original_records,
    build_records,
    build_user_prompt,
    evaluate_batch,
    filter_records_for_judging,
    judge_records,
    load_ignore_list,
    normalize_title,
    parse_judge_payload,
    process_summary,
)


def _mldr_rows():
    return [
        {
            "query_id": "q-en-1",
            "query": "what about sushi?",
            "positive_passages": [
                {"docid": "d1", "title": "Sushi", "text": "sushi is great. more text."},
            ],
            "negative_passages": [
                {"docid": "d2", "title": None, "text": "budget spreadsheets. boring."},
            ],
        },
        {
            "query_id": "q-en-2",
            "query": "what about plants?",
            "positive_passages": [
                {"docid": "d3", "title": ["Plant", "Care"], "text": "water the plants."},
            ],
            "negative_passages": [],
        },
    ]


def _fake_process(question, context, title, threshold, batch_size,
                  use_best_reranker_score, show_progress, return_sentence_texts):
    # Deterministic fake: prune nothing, score = len(text) scaled.
    pruned = [[c for c in ctxs] for ctxs in context]
    scores = [[0.5 + 0.001 * len(c) for c in ctxs] for ctxs in context]
    compression = [[10.0 for _ in ctxs] for ctxs in context]
    kept = [[[c] for c in ctxs] for ctxs in context]
    removed = [[[] for _ in ctxs] for ctxs in context]
    return {
        "pruned_context": pruned,
        "reranking_score": scores,
        "compression_rate": compression,
        "kept_sentences": kept,
        "removed_sentences": removed,
        "title": title,
    }


def test_normalize_title():
    assert normalize_title("  Sushi ") == "Sushi"
    assert normalize_title(["A", None, " B "]) == "A B"
    assert normalize_title("") is None
    assert normalize_title(None) is None
    assert normalize_title([]) is None


def test_build_records_schema_and_stats():
    records, stats, n_queries = build_records(
        _fake_process, _mldr_rows(), threshold=0.1, batch_size=4
    )
    assert n_queries == 2
    assert len(records) == 3
    first = records[0]
    assert set(first) == {
        "query_id", "query", "docid", "label", "title", "original_text",
        "pruned_text", "reranking_score", "compression_rate",
        "kept_sentences", "removed_sentences",
    }
    assert first["label"] == 1 and first["title"] == "Sushi"
    assert records[1]["label"] == 0
    assert records[2]["title"] == "Plant Care"
    assert len(stats["pos_scores"]) == 2
    assert len(stats["neg_scores"]) == 1
    assert stats["pos_compression"] == [10.0, 10.0]


def test_build_original_records_baseline():
    records, stats, n_queries = build_original_records(_mldr_rows())
    assert n_queries == 2 and len(records) == 3
    assert all(r["pruned_text"] == r["original_text"] for r in records)
    assert all(r["compression_rate"] == 0.0 for r in records)


def test_process_summary_means():
    records, stats, n = build_records(_fake_process, _mldr_rows(), threshold=0.1, batch_size=4)
    summary = process_summary(records, stats, n, args_payload={"threshold": 0.1}, elapsed=1.5)
    assert summary["num_records"] == 3
    assert summary["avg_pos_compression"] == 10.0
    assert summary["process_time_seconds"] == 1.5


def test_parse_judge_payload_variants():
    payload = parse_judge_payload('{"has_answer": 1, "answer_score": 0.9, "reasoning": "yes"}')
    assert payload == {"has_answer": 1, "answer_score": 0.9, "reasoning": "yes"}
    # Legacy aliases accepted (reference :1052-1057).
    payload = parse_judge_payload('{"contains_answer": 0, "reason": "no"}')
    assert payload["has_answer"] == 0 and payload["reasoning"] == "no"
    with pytest.raises(ValueError):
        parse_judge_payload('{"has_answer": 2, "reasoning": "x"}')
    with pytest.raises(ValueError):
        parse_judge_payload('{"has_answer": 1, "answer_score": 1.5, "reasoning": "x"}')
    with pytest.raises(json.JSONDecodeError):
        parse_judge_payload("not json")


def test_build_user_prompt_blocks():
    prompt = build_user_prompt("q?", "some text", "T")
    assert "<question>q?</question>" in prompt
    assert "<title>T</title>" in prompt
    assert "<text>some text</text>" in prompt
    prompt = build_user_prompt("", "", None)
    assert "(empty question)" in prompt and "(empty text)" in prompt and "(none)" in prompt


def test_filter_records_ignore_and_clamp():
    records = [
        {"query_id": "q1", "label": 1, "pruned_text": "x" * 100},
        {"query_id": "q2", "label": 1, "pruned_text": "keep"},
        {"query_id": "q3", "label": 0, "pruned_text": "neg"},
    ]
    filtered, skipped = filter_records_for_judging(
        records, ignore_map={"q1": "oversize"}, include_negatives=False, max_text_chars=10
    )
    assert [r["query_id"] for r in filtered] == ["q2"]
    assert skipped == [{"query_id": "q1", "reason": "oversize"}]
    filtered, _ = filter_records_for_judging(
        records, ignore_map={}, include_negatives=True, max_text_chars=10
    )
    assert len(filtered) == 3
    assert filtered[0]["pruned_text"] == "x" * 10  # clamped


def test_load_ignore_list(tmp_path):
    path = tmp_path / "ig.yaml"
    path.write_text("en:\n- qid: q-en-1\n  reason: oversize\nja: []\n")
    assert load_ignore_list(path, "en") == {"q-en-1": "oversize"}
    assert load_ignore_list(path, "ja") == {}


def test_load_ignore_list_jp_alias(tmp_path):
    # The reference YAML keys Japanese as "jp" (its --lang choice) while the
    # MLDR dataset language code is "ja" — both must resolve.
    path = tmp_path / "ig.yaml"
    path.write_text("en: []\njp:\n- qid: q-ja-7\n  reason: oversize\n")
    assert load_ignore_list(path, "ja") == {"q-ja-7": "oversize"}
    assert load_ignore_list(path, "jp") == {"q-ja-7": "oversize"}


def test_shipped_ignore_list_matches_reference():
    """The shipped ignore list must drop exactly the reference's flagged qids
    (SURVEY §7: Has Answer comparability requires ignore-list identity)."""
    shipped = Path(__file__).resolve().parents[1] / "scripts" / "eval_mldr" / "ignored_questions.yaml"
    en = load_ignore_list(shipped, "en")
    ja = load_ignore_list(shipped, "ja")
    assert len(en) == 26 and all(q.startswith("q-en-") for q in en)
    assert len(ja) == 34 and all(q.startswith("q-ja-") for q in ja)

    reference = Path("/root/reference/scripts/eval_mldr/ignored_questions.yaml")
    if reference.exists():
        assert en == load_ignore_list(reference, "en")
        assert ja == load_ignore_list(reference, "jp")

    records = [{"query_id": qid, "label": 1, "pruned_text": "t"} for qid in en]
    records.append({"query_id": "q-en-keep", "label": 1, "pruned_text": "t"})
    filtered, skipped = filter_records_for_judging(records, ignore_map=en)
    assert [r["query_id"] for r in filtered] == ["q-en-keep"]
    assert {s["query_id"] for s in skipped} == set(en)


def test_judge_records_with_fake_judge():
    async def fake_judge(prompt, config):
        if "sushi" in prompt:
            return {"has_answer": 1, "answer_score": 0.9, "reasoning": "found"}
        raise ValueError("judge exploded")

    records = [
        {"query_id": "q1", "query": "sushi?", "pruned_text": "sushi here", "title": None},
        {"query_id": "q2", "query": "other?", "pruned_text": "nothing", "title": None},
    ]
    config = JudgeConfig(retries=1, retry_delay=0.0, request_timeout=2.0)
    enriched, summary = judge_records(records, config, judge_fn=fake_judge)
    assert enriched[0]["llm_has_answer"] == 1
    assert enriched[1]["llm_has_answer"] is None
    assert enriched[1]["llm_error"] == "judge exploded"
    assert enriched[1]["llm_attempts"] == 2  # retried once
    assert summary["counts"] == {"has_answer_1": 1, "has_answer_0": 0, "failed": 1}
    assert summary["answer_score_stats"]["mean"] == 0.9


def test_evaluate_batch_timeout():
    async def slow_judge(prompt, config):
        await asyncio.sleep(10)

    config = JudgeConfig(retries=0, retry_delay=0.0, request_timeout=0.001)
    # hard timeout = max(1, 0.001)+5 ≈ 6s... use a custom quick check via
    # wait_for by shrinking: rely on retries=0 and TimeoutError propagation.
    records = [{"query_id": "q", "query": "q", "pruned_text": "t", "title": None}]

    async def fast_failing_judge(prompt, config):
        raise TimeoutError("too slow")

    results = asyncio.run(evaluate_batch(records, config, judge_fn=fast_failing_judge))
    assert results[0]["has_answer"] is None
    assert "too slow" in results[0]["error"]


def test_mldr_cli_end_to_end(tmp_path, monkeypatch):
    """Full two-stage CLI run against a local MLDR-format dataset and a
    monkeypatched judge (no network)."""
    from datasets import Dataset, DatasetDict

    rows = _mldr_rows()
    # Arrow columns can't mix str and list titles; MLDR titles are strings.
    rows[1]["positive_passages"][0]["title"] = "Plant Care"
    DatasetDict({"test": Dataset.from_list(rows)}).save_to_disk(str(tmp_path / "mldr"))

    from tests.test_process_engine import _tiny_model

    model = _tiny_model()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eval_mldr_cli", Path(__file__).resolve().parent.parent / "scripts" / "eval_mldr.py"
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    # Patch model loading to the tiny in-memory model and the judge to a fake.
    from open_provence_tpu import inference as inf_mod

    monkeypatch.setattr(
        inf_mod.OpenProvenceModel,
        "from_pretrained",
        classmethod(lambda cls, *a, **k: model),
    )
    import open_provence_tpu.eval.mldr_eval as mldr_eval

    async def fake_judge(prompt, config):
        return {"has_answer": 1, "answer_score": 1.0, "reasoning": "ok"}

    monkeypatch.setattr(mldr_eval, "call_openai_judge", fake_judge)

    out_dir = tmp_path / "run"
    rc = cli.main(
        [
            "--model", "ignored",
            "--dataset", str(tmp_path / "mldr"),
            "--output-dir", str(out_dir),
            "--threshold", "0.0",
            "--batch-size", "4",
            "--limit", "2",
            "--force-no-ignore",
            "--ignore-file", str(tmp_path / "missing.yaml"),
            "--no-progress",
        ]
    )
    assert rc == 0
    assert (out_dir / "process" / "dataset").exists()
    summary = json.loads((out_dir / "process" / "summary.json").read_text())
    assert summary["num_records"] == 3
    assert (out_dir / "process" / "result.md").exists()
    eval_summary = json.loads((out_dir / "eval_llm" / "summary.json").read_text())
    assert eval_summary["counts"]["has_answer_1"] == 2  # positives only
    assert (out_dir / "eval_llm" / "summary.md").exists()

    # Stage skip semantics: re-run without --force-process reuses artifacts.
    rc = cli.main(
        [
            "--model", "ignored",
            "--dataset", str(tmp_path / "mldr"),
            "--output-dir", str(out_dir),
            "--force-no-ignore",
            "--ignore-file", str(tmp_path / "missing.yaml"),
        ]
    )
    assert rc == 0


# --- naver-provence external baseline adapter --------------------------------


def test_naver_detection_regex():
    from open_provence_tpu.eval.external_baselines import is_naver_provence_model

    assert is_naver_provence_model(
        "naver/provence-reranker-debertav3-v1", is_local=False
    )
    assert is_naver_provence_model("NAVER/Provence-XL", is_local=False)
    assert not is_naver_provence_model("naver/splade-v3", is_local=False)
    assert not is_naver_provence_model("my/provence-clone", is_local=False)
    # local checkpoints never route to the baseline adapter
    assert not is_naver_provence_model(
        "naver/provence-reranker-debertav3-v1", is_local=True
    )
    assert not is_naver_provence_model(str(Path(__file__).parent))


def test_naver_adapter_with_fake_model():
    torch = pytest.importorskip("torch")

    from open_provence_tpu.eval.external_baselines import (
        load_naver_process_fn,
        prepare_naver_provence_model,
    )

    class FakeConfig:
        max_position_embeddings = 512

    class FakeNaver:
        def __init__(self):
            self.config = FakeConfig()
            self.max_len = 512
            self.eval_called = False

        def forward(self, *args, **kwargs):
            return {
                "ranking_scores": torch.ones(2, dtype=torch.bfloat16),
                "compression_logits": torch.zeros(2, 3, dtype=torch.bfloat16),
                "other": "untouched",
            }

        def eval(self):
            self.eval_called = True
            return self

        def to(self, device):
            return self

        def process(self, question, context, **kwargs):
            out = self.forward()
            return {
                "pruned_context": context,
                "reranking_score": float(out["ranking_scores"][0]),
            }

    model = FakeNaver()
    process_fn = prepare_naver_provence_model(model, max_length=1024)
    # max_length propagated to both attributes (reference :107-111)
    assert model.max_len == 1024
    assert model.config.max_position_embeddings == 1024
    # forward wrapper upcasts bf16 outputs to fp32 and leaves others alone
    out = model.forward()
    assert out["ranking_scores"].dtype == torch.float32
    assert out["compression_logits"].dtype == torch.float32
    assert out["other"] == "untouched"
    result = process_fn("q?", "ctx")
    assert result["pruned_context"] == "ctx"

    class FakeAutoModel:
        last_kwargs = None

        @classmethod
        def from_pretrained(cls, ident, **kwargs):
            cls.last_kwargs = (ident, kwargs)
            return FakeNaver()

    fn, loaded = load_naver_process_fn(
        "naver/provence-reranker-debertav3-v1",
        max_length=2048,
        auto_model_cls=FakeAutoModel,
    )
    assert loaded.eval_called
    assert loaded.max_len == 2048
    assert FakeAutoModel.last_kwargs[0] == "naver/provence-reranker-debertav3-v1"
    assert FakeAutoModel.last_kwargs[1]["trust_remote_code"] is True
    assert fn("q?", "ctx")["pruned_context"] == "ctx"


def test_naver_adapter_requires_process():
    pytest.importorskip("torch")
    from open_provence_tpu.eval.external_baselines import (
        prepare_naver_provence_model,
    )

    class NoProcess:
        def forward(self, *a, **k):
            return {}

    with pytest.raises(AttributeError, match="process"):
        prepare_naver_provence_model(NoProcess())
