#!/usr/bin/env python3
"""Limit duplicate texts per dataset via MD5 fingerprints — produces the
"freqN" subsets (counterpart of the reference's frequency_filter_ds.py)."""

from __future__ import annotations

import argparse
import json
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
    parser.add_argument("--threshold", type=int, default=2,
                        help="Max already-seen duplicate texts per kept row.")
    parser.add_argument("--id-column", default="id")
    parser.add_argument("--texts-column", default="texts")
    parser.add_argument("--debug-limit", type=int, default=None)
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args(argv)

    from datasets import DatasetDict, load_dataset, load_from_disk

    from open_provence_tpu.datasets_factory import frequency_filter_train

    local = Path(args.dataset).expanduser()
    source = load_from_disk(str(local)) if local.exists() else load_dataset(args.dataset)
    if not isinstance(source, DatasetDict):
        source = DatasetDict({"train": source})

    out = {}
    stats_payload = {}
    for name, ds in source.items():
        if args.debug_limit:
            ds = ds.select(range(min(args.debug_limit, len(ds))))
        if name == "train":
            filtered, stats, _ = frequency_filter_train(
                ds, args.threshold,
                id_column=args.id_column, texts_column=args.texts_column,
            )
            out[name] = filtered
            stats_payload[name] = stats.to_dict()
            print(f"{name}: kept {stats.rows_kept}/{stats.rows_total} rows "
                  f"(dup ratio {stats.texts_dup_ratio:.3f})")
        else:
            out[name] = ds

    args.output_dir.mkdir(parents=True, exist_ok=True)
    DatasetDict(out).save_to_disk(str(args.output_dir))
    (args.output_dir / "frequency_filter_stats.json").write_text(
        json.dumps(stats_payload, indent=2)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
