"""Test configuration: force CPU with an 8-device virtual mesh.

Tests are CPU-only and network-free, mirroring the reference's test strategy
(SURVEY.md §4) plus multi-device pjit coverage the reference lacks. The env
vars must be set before jax initializes a backend.
"""

import os
import sys
from pathlib import Path

# Force CPU: the session env may preset JAX_PLATFORMS to a TPU platform, and
# TPU fp32 matmuls are not bit-comparable with torch CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
