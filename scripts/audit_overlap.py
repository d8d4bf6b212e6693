#!/usr/bin/env python
"""Audit distinctive-line overlap between repo files and the reference tree.

For each repo file given, counts "distinctive" lines (stripped length >= 25
chars, not pure punctuation/imports) that appear verbatim anywhere in the
reference tree, and reports the percentage. The round-3 bar for rewritten
host-layer files is <15% per file.

Usage: python scripts/audit_overlap.py [files...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REFERENCE = Path("/root/reference")
REPO = Path("/root/repo")

DEFAULT_TARGETS = [
    "open_provence_tpu/inference/inputs.py",
    "open_provence_tpu/inference/postprocess.py",
    "open_provence_tpu/inference/engine.py",
    "open_provence_tpu/train/data.py",
    "open_provence_tpu/train/span_labels.py",
    "open_provence_tpu/text/fragmentation.py",
    "open_provence_tpu/text/splitters.py",
    "open_provence_tpu/datasets_factory/converter.py",
]


def distinctive_lines(path: Path) -> set[str]:
    out: set[str] = set()
    try:
        text = path.read_text(errors="replace")
    except OSError:
        return out
    for raw in text.splitlines():
        line = raw.strip()
        if len(line) < 25:
            continue
        if line.startswith(("#", '"', "'", "import ", "from ")):
            continue
        out.add(line)
    return out


def build_reference_index() -> set[str]:
    index: set[str] = set()
    for path in REFERENCE.rglob("*.py"):
        index |= distinctive_lines(path)
    return index


def main() -> int:
    targets = sys.argv[1:] or DEFAULT_TARGETS
    if not REFERENCE.exists():
        print("reference tree absent; nothing to audit")
        return 0
    ref_index = build_reference_index()
    worst = 0.0
    for rel in targets:
        path = REPO / rel
        lines = distinctive_lines(path)
        if not lines:
            print(f"{rel}: no distinctive lines")
            continue
        hits = sorted(line for line in lines if line in ref_index)
        pct = 100.0 * len(hits) / len(lines)
        worst = max(worst, pct)
        marker = "FAIL" if pct >= 15.0 else "ok"
        print(f"{rel}: {len(hits)}/{len(lines)} = {pct:.1f}% [{marker}]")
        if "-v" in sys.argv or pct >= 15.0:
            for line in hits[:40]:
                print(f"    | {line[:110]}")
    return 1 if worst >= 15.0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
