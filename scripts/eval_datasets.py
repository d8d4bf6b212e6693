#!/usr/bin/env python3
"""Evaluate OpenProvence-TPU checkpoints on context relevance datasets.

CLI wrapper over open_provence_tpu.eval.datasets_eval — span-level F2 sweeps
with the reference's report format (counterpart of the reference's
scripts/eval_datasets.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Evaluate OpenProvence-TPU checkpoints on context relevance datasets.",
    )
    parser.add_argument("--config", required=True, help="YAML file describing datasets to load.")
    parser.add_argument("--model", required=True, help="Local checkpoint directory.")
    parser.add_argument("--threshold", type=float, default=0.1)
    parser.add_argument(
        "--thresholds", "--th", action="append", dest="threshold_list",
        help="Comma separated thresholds; repeatable (e.g. --th 0.05,0.1 --th 0.2).",
    )
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--split", help="Override split for every dataset in the config.")
    parser.add_argument("--limit", type=int, help="Evaluate only the first N examples.")
    parser.add_argument(
        "--target", action="append",
        help="Limit evaluation to 'dataset_name:subset' keys. Repeatable.",
    )
    parser.add_argument("--output-file", type=Path, help="Markdown report path.")
    parser.add_argument("--output-json", type=Path, help="JSON metrics path.")
    parser.add_argument("--tokenizer", help="Tokenizer path override (offline use).")
    parser.add_argument("--attention-impl", default="auto", choices=["auto", "xla", "pallas"])
    parser.add_argument("--no-progress", action="store_false", dest="show_progress")
    parser.add_argument("--silent", action="store_true")
    parser.add_argument("--timing-details", action="store_true")
    parser.set_defaults(show_progress=True)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    args = parse_args(argv)
    from open_provence_tpu.eval.datasets_eval import EvalConfig, run_evaluation
    from open_provence_tpu.inference import OpenProvenceModel

    thresholds: list[float] = []
    for entry in args.threshold_list or []:
        for chunk in str(entry).split(","):
            if chunk.strip():
                thresholds.append(float(chunk.strip()))
    if not thresholds:
        thresholds = [args.threshold]
    # De-dup preserving order.
    seen: set[float] = set()
    thresholds = [t for t in thresholds if not (t in seen or seen.add(t))]

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)

    model = OpenProvenceModel.from_pretrained(
        args.model, tokenizer=tokenizer, attention_impl=args.attention_impl
    )
    eval_config = EvalConfig.load(args.config)
    result = run_evaluation(
        model,
        eval_config,
        model_name=args.model,
        config_path=str(args.config),
        thresholds=thresholds,
        batch_size=args.batch_size,
        split_override=args.split,
        limit=args.limit,
        targets={t.strip() for t in (args.target or []) if t} or None,
        show_progress=args.show_progress and not args.silent,
        output_file=args.output_file,
        output_json=args.output_json,
    )
    if not args.output_file:
        print(result["markdown"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
