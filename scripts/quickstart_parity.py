#!/usr/bin/env python
"""Real-checkpoint quickstart parity runbook (VERDICT r4 next-round #8).

The one undischarged proof in SURVEY §7's minimum end-to-end slice: real
`open-provence-reranker-xsmall-v1` weights -> JAX forward -> process() on the
README quickstart example (reference README.md:52-88) must reproduce
  reranking_score ~= 0.6448, compression_rate ~= 44.37  at threshold 0.1,
keeping exactly the two Japan-related sentences. Blocked only by the
environment (no network, no mounted checkpoint); run this the moment either
becomes available:

    python scripts/quickstart_parity.py --checkpoint /path/to/xsmall-ckpt

or set OPEN_PROVENCE_XSMALL_CHECKPOINT and run the pytest hook
(tests/test_quickstart_parity.py), which skips when no checkpoint is present.

The checkpoint directory must be the published HF layout (config.json +
model.safetensors with merged ranking_model.*/pruning_head.* keys + tokenizer
files) — exactly what `AutoModel.from_pretrained` would download; no prior
conversion step is needed (utils/hf_convert.load_checkpoint understands both
prefix layouts, validated per-family in tests/test_checkpoint_families.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open_provence_tpu.utils.platform import apply_platform_env  # noqa: E402

CHECKPOINT_ENV = "OPEN_PROVENCE_XSMALL_CHECKPOINT"
HUB_ID = "hotchpotch/open-provence-reranker-xsmall-v1"

QUESTION = "What's your favorite Japanese food?"
CONTEXT = """
Work deadlines piled up today, and I kept rambling about budget spreadsheets to my roommate.
Next spring I'm planning a trip to Japan so I can wander Kyoto's markets and taste every regional dish I find.
Sushi is honestly my favourite—I want to grab a counter seat and let the chef serve endless nigiri until I'm smiling through soy sauce.
Later I remembered to water the plants and pay the electricity bill before finally getting some sleep.
"""

# Reference README.md:81-88 (RTX 5090, th=0.1). Tolerances: keep decisions are
# thresholded, so the kept-sentence set and hence compression must match
# exactly; the raw sigmoid score gets a small numeric band for bf16/hardware
# differences.
EXPECTED_SCORE = 0.6448
EXPECTED_COMPRESSION = 44.37
SCORE_ATOL = 0.02
COMPRESSION_ATOL = 0.5
EXPECTED_KEPT_SUBSTRINGS = (
    "Next spring I'm planning a trip to Japan",
    "Sushi is honestly my favourite",
)
EXPECTED_PRUNED_SUBSTRINGS = (
    "budget spreadsheets",
    "electricity bill",
)


def resolve_checkpoint(explicit: str | None) -> str | None:
    """Local dir from --checkpoint / env var, else the hub id (needs network)."""
    for candidate in (explicit, os.environ.get(CHECKPOINT_ENV)):
        if candidate:
            if Path(candidate).expanduser().is_dir():
                return str(Path(candidate).expanduser())
            return candidate  # hub id or missing path: let loading report it
    return None


def run(checkpoint: str, threshold: float = 0.1) -> dict:
    apply_platform_env()
    from open_provence_tpu.inference import OpenProvenceModel

    model = OpenProvenceModel.from_pretrained(checkpoint)
    result = model.process(
        question=QUESTION,
        context=CONTEXT,
        threshold=threshold,
        show_progress=False,
    )
    return result


def check(result: dict) -> list[str]:
    """Return a list of parity failures (empty = pass)."""
    failures: list[str] = []
    pruned = result["pruned_context"]
    for fragment in EXPECTED_KEPT_SUBSTRINGS:
        if fragment not in pruned:
            failures.append(f"expected kept sentence missing: {fragment!r}")
    for fragment in EXPECTED_PRUNED_SUBSTRINGS:
        if fragment in pruned:
            failures.append(f"expected pruned sentence survived: {fragment!r}")
    score = float(result["reranking_score"])
    if abs(score - EXPECTED_SCORE) > SCORE_ATOL:
        failures.append(
            f"reranking_score {score:.4f} vs expected {EXPECTED_SCORE} "
            f"(atol {SCORE_ATOL})"
        )
    compression = float(result["compression_rate"])
    if abs(compression - EXPECTED_COMPRESSION) > COMPRESSION_ATOL:
        failures.append(
            f"compression_rate {compression:.2f} vs expected "
            f"{EXPECTED_COMPRESSION} (atol {COMPRESSION_ATOL})"
        )
    return failures


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--checkpoint",
        help=f"xsmall checkpoint dir (HF layout); default ${CHECKPOINT_ENV} "
        f"or the hub id {HUB_ID} (network required)",
    )
    parser.add_argument("--threshold", type=float, default=0.1)
    parser.add_argument(
        "--json", action="store_true", help="print the raw process() payload"
    )
    args = parser.parse_args(argv)

    checkpoint = resolve_checkpoint(args.checkpoint) or HUB_ID
    print(f"quickstart parity: loading {checkpoint}", flush=True)
    try:
        result = run(checkpoint, threshold=args.threshold)
    except Exception as exc:  # loading is environment-bound; report crisply
        print(f"BLOCKED: could not load/process ({type(exc).__name__}: {exc})")
        return 2

    if args.json:
        print(json.dumps({k: v for k, v in result.items() if k != "performance_trace"},
                         ensure_ascii=False, indent=2, default=str))
    print(f"reranking_score:  {float(result['reranking_score']):.4f} "
          f"(expected {EXPECTED_SCORE})")
    print(f"compression_rate: {float(result['compression_rate']):.2f} "
          f"(expected {EXPECTED_COMPRESSION})")
    failures = check(result)
    if failures:
        for failure in failures:
            print(f"FAIL: {failure}")
        return 1
    print("PASS: quickstart parity reproduced (README.md:81-88)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
