#!/usr/bin/env python3
"""Annotate relevant spans: add a ``context_spans_relevance`` mask per chunk
(counterpart of the reference's add_context_spans_relevance.py, which uses a
vLLM span teacher).

Teachers:
* --annotator encoder --teacher-model <checkpoint> — an OpenProvence
  checkpoint's chunk predictions (TPU-native path),
* --annotator openai --teacher-model <llm> — numbered-chunk prompt over an
  OpenAI-compatible endpoint (OPENAI_API_KEY).

Interrupted runs resume from the shard cache (--cache-dir).
"""

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
    parser.add_argument("--dataset", required=True, help="Local save_to_disk path or Hub ID.")
    parser.add_argument("--split", default=None, help="Annotate one split (default: all).")
    parser.add_argument("--annotator", choices=["encoder", "openai"], default="encoder")
    parser.add_argument("--teacher-model", required=True)
    parser.add_argument("--tokenizer", help="Tokenizer path override for encoder annotator.")
    parser.add_argument("--token-threshold", type=float, default=0.5)
    parser.add_argument("--chunk-threshold", type=float, default=0.5)
    parser.add_argument("--cache-dir", type=Path, default=None)
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args(argv)

    from datasets import DatasetDict, load_dataset, load_from_disk

    from open_provence_tpu.datasets_factory import (
        ShardCache,
        annotate_span_relevance,
        make_encoder_annotator,
        make_openai_annotator,
    )

    local = Path(args.dataset).expanduser()
    source = load_from_disk(str(local)) if local.exists() else load_dataset(args.dataset)
    if not isinstance(source, DatasetDict):
        source = DatasetDict({"train": source})

    if args.annotator == "encoder":
        from open_provence_tpu.encoder import OpenProvenceEncoder

        tokenizer = None
        if args.tokenizer:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        encoder = OpenProvenceEncoder.from_pretrained(args.teacher_model, tokenizer=tokenizer)
        annotator = make_encoder_annotator(
            encoder,
            token_threshold=args.token_threshold,
            chunk_threshold=args.chunk_threshold,
        )
    else:
        annotator = make_openai_annotator(args.teacher_model)

    cache = ShardCache(args.cache_dir) if args.cache_dir else None
    out = {}
    for name, ds in source.items():
        if args.split and name != args.split:
            out[name] = ds
            continue
        out[name] = annotate_span_relevance(ds, annotator, cache=cache)
        print(f"{name}: annotated {len(out[name])} rows")

    # Atomic dataset rewrite (reference :112-134): write to tmp, then swap.
    output_dir = args.output_dir
    tmp_dir = output_dir.with_name(output_dir.name + ".tmp")
    DatasetDict(out).save_to_disk(str(tmp_dir))
    if output_dir.exists():
        import shutil

        shutil.rmtree(output_dir)
    tmp_dir.rename(output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
