#!/usr/bin/env python3
"""Release smoke test: run process() through the input-shape contract cases
against a checkpoint (counterpart of the reference's
scripts/hf_utils/hf_model_process_check.py, build_cases :42-64)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def build_cases() -> list[dict]:
    """Five input-shape cases: str, list, aligned, nested, titles."""
    question = "What's your favorite Japanese food?"
    context = (
        "Work deadlines piled up today. "
        "Sushi is honestly my favourite dish. "
        "Later I watered the plants."
    )
    return [
        {"name": "str", "question": question, "context": context},
        {"name": "list", "question": question, "context": [context, "Another doc. More text."]},
        {
            "name": "aligned",
            "question": [question, "What about plants?"],
            "context": [context, "Plants need regular watering. Budgets are boring."],
        },
        {
            "name": "nested",
            "question": [question, "What about plants?"],
            "context": [[context], ["Plants need water.", "Sushi is unrelated here."]],
        },
        {
            "name": "titles",
            "question": question,
            "context": [context],
            "kwargs": {"title": ["Food Diary"], "always_select_title": True},
        },
    ]


def main(argv=None) -> int:
    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="Checkpoint directory (or hub id).")
    parser.add_argument("--tokenizer", help="Tokenizer path override.")
    parser.add_argument("--threshold", type=float, default=0.1)
    args = parser.parse_args(argv)

    from open_provence_tpu.inference import OpenProvenceModel

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    model = OpenProvenceModel.from_pretrained(args.model, tokenizer=tokenizer)

    failures = 0
    for case in build_cases():
        kwargs = dict(case.get("kwargs") or {})
        try:
            result = model.process(
                case["question"],
                case["context"],
                threshold=args.threshold,
                show_progress=False,
                **kwargs,
            )
            assert "pruned_context" in result and "reranking_score" in result
            print(f"✓ {case['name']}")
        except Exception as exc:
            failures += 1
            print(f"✗ {case['name']}: {exc}")
    print(f"{len(build_cases()) - failures}/{len(build_cases())} cases passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
