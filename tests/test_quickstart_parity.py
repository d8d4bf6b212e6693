"""Real-checkpoint quickstart parity hook (VERDICT r4 #8).

Runs the README quickstart example (reference README.md:52-88) against real
xsmall weights and asserts rerank ~= 0.6448 / compression ~= 44.37 at th=0.1.
Skips unless a checkpoint directory is reachable — the proof is
environmentally blocked (no network) until one is mounted; set
OPEN_PROVENCE_XSMALL_CHECKPOINT to a published-layout checkpoint dir to arm it.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "scripts"))

import quickstart_parity  # noqa: E402

_CKPT = quickstart_parity.resolve_checkpoint(None)

pytestmark = pytest.mark.skipif(
    not (_CKPT and Path(_CKPT).is_dir()),
    reason=f"no local xsmall checkpoint (set {quickstart_parity.CHECKPOINT_ENV})",
)


def test_quickstart_parity_real_weights():
    result = quickstart_parity.run(_CKPT, threshold=0.1)
    failures = quickstart_parity.check(result)
    assert not failures, failures
