#!/usr/bin/env python3
"""Convert sentence-transformer-style triplet datasets to OpenProvence
format (counterpart of the reference's
generate_ds_from_sentense_transformer.py).

Example:
    python scripts/context_relevance_datasets/generate_ds_from_sentence_transformer.py \
        --dataset tomaarsen/natural-questions-hard-negatives --subset triplet-5 \
        --lang en --output-dir out_ds
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
    parser.add_argument("--dataset", required=True, help="Hub ID or local save_to_disk path.")
    parser.add_argument("--subset", default=None)
    parser.add_argument("--lang", default="en")
    parser.add_argument("--sample-size", type=int, default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args(argv)

    from datasets import DatasetDict, load_dataset, load_from_disk

    from open_provence_tpu.datasets_factory import (
        convert_dataset_dict,
        slugify_dataset_name,
    )

    local = Path(args.dataset).expanduser()
    if local.exists():
        source = load_from_disk(str(local))
    else:
        source = load_dataset(args.dataset, args.subset)

    converted = convert_dataset_dict(
        source,
        language=args.lang,
        dataset_slug=slugify_dataset_name(args.dataset, args.subset),
        sample_size=args.sample_size,
        seed=args.seed,
    )
    assert isinstance(converted, DatasetDict)
    converted.save_to_disk(str(args.output_dir))
    for name, ds in converted.items():
        print(f"{name}: {len(ds)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
