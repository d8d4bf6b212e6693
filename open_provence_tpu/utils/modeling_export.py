"""Standalone checkpoint bundles.

The reference's flagship portability property is that a checkpoint directory
is self-contained: the standalone modeling file is copied next to the
weights so the model runs without installing the package
(reference utils/modeling_export.py:8-14; encoder.py:993-1000). The
TPU-native equivalent: vendor the minimal ``open_provence_tpu`` inference
subset into the checkpoint directory plus a loader shim
(``modeling_open_provence_tpu.py``) that works with only
jax/flax/numpy/safetensors/tokenizers installed.
"""

from __future__ import annotations

import shutil
from pathlib import Path

_PACKAGE_ROOT = Path(__file__).resolve().parent.parent

# Inference-only subset — no train/, no eval/, no datasets_factory/.
_BUNDLE_INCLUDE = [
    "__init__.py",
    "configs.py",
    "data_structures.py",
    "encoder.py",
    "modeling_open_provence_tpu.py",
    "models",
    "native",
    "ops",
    "text",
    "inference",
    "utils/__init__.py",
    "utils/hf_convert.py",
    "utils/tracing.py",
    "utils/modeling_export.py",
]

_SHIM = '''"""Self-contained loader for this OpenProvence-TPU checkpoint.

Usage without installing the package:

    import modeling_open_provence_tpu as m
    model = m.OpenProvenceModel.from_pretrained(".")
    result = model.process("question?", "context text...")
"""

import sys
from pathlib import Path

_HERE = Path(__file__).resolve().parent
if str(_HERE) not in sys.path:
    sys.path.insert(0, str(_HERE))

from open_provence_tpu.configs import OpenProvenceConfig  # noqa: E402,F401
from open_provence_tpu.encoder import OpenProvenceEncoder  # noqa: E402,F401
from open_provence_tpu.inference import OpenProvenceModel  # noqa: E402,F401
from open_provence_tpu.models.hf_wrappers import (  # noqa: E402,F401
    OpenProvenceForSequenceClassification,
    OpenProvenceForTokenClassification,
)
'''


def write_standalone_bundle(checkpoint_dir: str | Path) -> Path:
    """Vendor the inference package subset + loader shim into a checkpoint
    directory (idempotent refresh)."""
    checkpoint_dir = Path(checkpoint_dir)
    target_pkg = checkpoint_dir / "open_provence_tpu"
    if target_pkg.exists():
        shutil.rmtree(target_pkg)
    for rel in _BUNDLE_INCLUDE:
        src = _PACKAGE_ROOT / rel
        dst = target_pkg / rel
        if src.is_dir():
            shutil.copytree(
                src, dst, ignore=shutil.ignore_patterns("__pycache__", "*.pyc")
            )
        else:
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)
    # encoder.py imports train.encoder_init lazily only for
    # from-scratch init; provide a stub package so the bundle stays
    # inference-only but importable.
    (target_pkg / "train").mkdir(exist_ok=True)
    (target_pkg / "train" / "__init__.py").write_text(
        '"""Training is not included in standalone checkpoint bundles."""\n'
    )
    shim_path = checkpoint_dir / "modeling_open_provence_tpu.py"
    shim_path.write_text(_SHIM)
    return shim_path


def write_modeling_open_provence(source: Path, destination: Path) -> None:
    """Verbatim file copy (reference utils/modeling_export.py:8-14)."""
    destination.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(source, destination)
