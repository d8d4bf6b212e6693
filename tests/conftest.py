"""Test configuration: force CPU with an 8-device virtual mesh.

Tests are CPU-only and network-free, mirroring the reference's test strategy
(SURVEY.md §4) plus multi-device pjit coverage the reference lacks.

Note: this environment preloads jax and programmatically sets
``jax_platforms="axon,cpu"`` (a TPU plugin), which overrides the
JAX_PLATFORMS env var — so we must force CPU via jax.config.update. The
XLA_FLAGS host-device-count flag must still be set before the CPU backend
initializes.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
