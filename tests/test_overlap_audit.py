"""The overlap audit is a real gate: regressions fail the suite (VERDICT r3
#6). Runs scripts/audit_overlap.py over its default target set — every file
must stay under the 15% adjudicated bar (contract-line patterns + the frozen
reviewed allowlist in scripts/overlap_allowlist.txt)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted"
)


def test_overlap_audit_passes():
    proc = subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "audit_overlap.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "FAIL" not in proc.stdout, proc.stdout
