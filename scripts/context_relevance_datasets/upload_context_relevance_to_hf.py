#!/usr/bin/env python3
"""Push a context-relevance DatasetDict to the Hugging Face Hub with a
size estimate and dry-run mode (counterpart of the reference's
upload_context_relevance_to_hf.py). Requires network access + HF_TOKEN."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def estimate_size_bytes(dataset_dict) -> int:
    total = 0
    for ds in dataset_dict.values():
        info_size = getattr(ds, "info", None)
        if info_size is not None and getattr(info_size, "size_in_bytes", None):
            total += int(info_size.size_in_bytes)
        else:
            total += sum(
                len(str(row).encode("utf-8")) for row in ds.select(range(min(len(ds), 100)))
            ) * max(1, len(ds) // max(1, min(len(ds), 100)))
    return total


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True, help="Local save_to_disk directory.")
    parser.add_argument("--repo-id", required=True, help="Target hub repo, e.g. user/name.")
    parser.add_argument("--subset", default=None, help="Config name on the hub.")
    parser.add_argument("--private", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)

    from datasets import DatasetDict, load_from_disk

    source = load_from_disk(args.dataset)
    if not isinstance(source, DatasetDict):
        source = DatasetDict({"train": source})

    size = estimate_size_bytes(source)
    print(f"Estimated upload size: {size / 1e6:.1f} MB "
          f"({', '.join(f'{k}={len(v)}' for k, v in source.items())})")
    if args.dry_run:
        print("[dry-run] Skipping push_to_hub.")
        return 0

    kwargs = {"private": args.private}
    if args.subset:
        kwargs["config_name"] = args.subset
    source.push_to_hub(args.repo_id, **kwargs)
    print(f"Pushed to https://huggingface.co/datasets/{args.repo_id}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
