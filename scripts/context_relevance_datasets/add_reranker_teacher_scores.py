#!/usr/bin/env python3
"""Add ``teacher_scores.<model>`` columns by scoring every (query, text)
pair with a reranker checkpoint (counterpart of the reference's
add_reranker_teacher_scores.py, which uses sentence-transformers
CrossEncoder; here the teacher is an OpenProvence-TPU checkpoint scored on
device)."""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--teacher-model", required=True, help="Checkpoint directory.")
    parser.add_argument("--teacher-name", default=None,
                        help="Column suffix (default: checkpoint dir name).")
    parser.add_argument("--tokenizer", help="Tokenizer path override.")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args(argv)

    from datasets import DatasetDict, load_dataset, load_from_disk

    from open_provence_tpu.datasets_factory import add_teacher_scores
    from open_provence_tpu.encoder import OpenProvenceEncoder

    local = Path(args.dataset).expanduser()
    source = load_from_disk(str(local)) if local.exists() else load_dataset(args.dataset)
    if not isinstance(source, DatasetDict):
        source = DatasetDict({"train": source})

    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    encoder = OpenProvenceEncoder.from_pretrained(args.teacher_model, tokenizer=tokenizer)
    teacher_name = args.teacher_name or Path(args.teacher_model).name

    out = {}
    for name, ds in source.items():
        out[name] = add_teacher_scores(
            ds,
            lambda pairs: encoder.predict(pairs, batch_size=args.batch_size),
            teacher_name=teacher_name,
            batch_size=args.batch_size,
        )
        print(f"{name}: scored {len(out[name])} rows → teacher_scores.{teacher_name}")
    DatasetDict(out).save_to_disk(str(args.output_dir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
