#!/usr/bin/env python
"""One-command golden parity check against the reference README quickstart.

Usage:
    python scripts/golden_parity.py <checkpoint_dir> [--threshold 0.1]
        [--expect-score 0.6448] [--expect-compression 44.37] [--tol 0.01]

``checkpoint_dir`` is an HF-layout OpenProvence checkpoint (config.json +
model.safetensors + tokenizer files), e.g. a local clone of
hotchpotch/open-provence-reranker-xsmall-v1. The script runs the exact
README quickstart (reference README.md:52-88) through the TPU engine and
asserts the published numbers: reranking_score≈0.6448 and
compression_rate≈44.37 at threshold 0.1 for the xsmall checkpoint.

Runnable the moment network/weights are available; the mechanism (not the
golden numbers) is unit-tested offline in tests/test_release_tooling.py.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any

QUICKSTART_QUESTION = "What's your favorite Japanese food?"
QUICKSTART_CONTEXT = """
Work deadlines piled up today, and I kept rambling about budget spreadsheets to my roommate.
Next spring I'm planning a trip to Japan so I can wander Kyoto's markets and taste every regional dish I find.
Sushi is honestly my favourite—I want to grab a counter seat and let the chef serve endless nigiri until I'm smiling through soy sauce.
Later I remembered to water the plants and pay the electricity bill before finally getting some sleep.
"""

XSMALL_EXPECTED_SCORE = 0.6448
XSMALL_EXPECTED_COMPRESSION = 44.37


def run_quickstart(
    checkpoint_dir: str,
    *,
    threshold: float = 0.1,
    tokenizer: Any = None,
    show_progress: bool = False,
) -> dict[str, Any]:
    """Load the checkpoint and run the README quickstart; returns process()
    output."""
    from open_provence_tpu.inference import OpenProvenceModel

    model = OpenProvenceModel.from_pretrained(checkpoint_dir, tokenizer=tokenizer)
    return model.process(
        question=QUICKSTART_QUESTION,
        context=QUICKSTART_CONTEXT,
        threshold=threshold,
        show_progress=show_progress,
    )


def check_result(
    result: dict[str, Any],
    *,
    expect_score: float,
    expect_compression: float,
    tol_score: float = 0.01,
    tol_compression: float = 0.5,
) -> list[str]:
    """Return a list of failure messages (empty = parity holds)."""
    failures: list[str] = []
    score = round(float(result["reranking_score"]), 4)
    compression = round(float(result["compression_rate"]), 2)
    if abs(score - expect_score) > tol_score:
        failures.append(
            f"reranking_score {score} differs from expected {expect_score} "
            f"by more than {tol_score}"
        )
    if abs(compression - expect_compression) > tol_compression:
        failures.append(
            f"compression_rate {compression} differs from expected "
            f"{expect_compression} by more than {tol_compression}"
        )
    return failures


def main(argv: list[str] | None = None) -> int:
    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint_dir")
    parser.add_argument("--threshold", type=float, default=0.1)
    parser.add_argument("--expect-score", type=float, default=XSMALL_EXPECTED_SCORE)
    parser.add_argument(
        "--expect-compression", type=float, default=XSMALL_EXPECTED_COMPRESSION
    )
    parser.add_argument("--tol-score", type=float, default=0.01)
    parser.add_argument("--tol-compression", type=float, default=0.5)
    args = parser.parse_args(argv)

    result = run_quickstart(
        args.checkpoint_dir, threshold=args.threshold, show_progress=True
    )
    print("Pruned context:\n" + result["pruned_context"])
    print("Reranking score:", round(result["reranking_score"], 4))
    print("Compression rate:", round(result["compression_rate"], 2))

    failures = check_result(
        result,
        expect_score=args.expect_score,
        expect_compression=args.expect_compression,
        tol_score=args.tol_score,
        tol_compression=args.tol_compression,
    )
    if failures:
        for line in failures:
            print("PARITY FAIL:", line, file=sys.stderr)
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
