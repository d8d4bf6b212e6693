"""Build the two-head model from a pretrained backbone or checkpoint.

Counterpart of ``OpenProvenceEncoder.__init__`` (reference
encoder.py:48-172): the ranking backbone is initialized from a pretrained
ModernBERT checkpoint while the pruning head (and, when label counts differ,
the classifier) starts fresh. Accepted layouts at ``model_name_or_path``
(a local directory — this environment has no hub access):

* an OpenProvence checkpoint (config.json with model_type=open_provence +
  merged model.safetensors) → continue training from it,
* a HF ModernBERT checkpoint (sequence-classification or bare backbone
  safetensors) → backbone weights loaded, heads initialized,
* a config-only directory → full random init (toy/offline runs).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..configs import ModernBertBackboneConfig, OpenProvenceConfig
from ..models.model import OpenProvenceModule, build_module
from ..utils.hf_convert import (
    hf_to_flax_params,
    load_safetensors_state_dict,
)

logger = logging.getLogger(__name__)


def _merge_params(base: dict, overlay: dict) -> dict:
    out = dict(base)
    for key, value in overlay.items():
        if isinstance(value, dict) and isinstance(out.get(key), dict):
            out[key] = _merge_params(out[key], value)
        else:
            if key in out and hasattr(out[key], "shape") and hasattr(value, "shape"):
                if tuple(out[key].shape) != tuple(np.asarray(value).shape):
                    logger.warning(
                        "Shape mismatch for %s: checkpoint %s vs model %s — keeping fresh init",
                        key, np.asarray(value).shape, out[key].shape,
                    )
                    continue
            out[key] = value
    return out


def init_encoder(
    model_name_or_path: str | Path,
    *,
    num_labels: int | None = None,
    max_length: int = 512,
    classifier_dropout: float = 0.1,
    seed: int = 42,
    default_threadshold: float | None = None,
) -> tuple[OpenProvenceConfig, OpenProvenceModule, Any]:
    """Returns (config, module, params)."""
    path = Path(model_name_or_path)
    if not path.exists():
        raise FileNotFoundError(
            f"model_name_or_path '{path}' not found. This environment is "
            "offline; provide a local checkpoint or config directory."
        )
    raw_config = json.loads((path / "config.json").read_text())
    is_open_provence = raw_config.get("model_type") == "open_provence"

    if is_open_provence:
        config = OpenProvenceConfig.from_dict(raw_config)
        if num_labels is not None:
            config.num_labels = num_labels
        config.max_length = max_length
    else:
        backbone = ModernBertBackboneConfig.from_hf_dict(raw_config)
        resolved_labels = num_labels
        if resolved_labels is None:
            resolved_labels = raw_config.get("num_labels", 2) or 2
        backbone.num_labels = resolved_labels
        config = OpenProvenceConfig(
            base_model_name_or_path=str(path),
            base_model_config=backbone.to_dict(),
            num_labels=resolved_labels,
            num_pruning_labels=2,
            max_length=max_length,
            pruning_config={
                "hidden_size": backbone.hidden_size,
                "classifier_dropout": classifier_dropout,
                "sentence_pooling": "mean",
                "use_weighted_pooling": False,
            },
            encoder_architecture=raw_config.get("model_type"),
            default_threadshold=default_threadshold,
        )

    module = build_module(config)
    init_params = module.init(
        jax.random.PRNGKey(seed),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]

    weights_path = path / "model.safetensors"
    if weights_path.exists():
        state_dict = load_safetensors_state_dict(weights_path)
        loaded = hf_to_flax_params(state_dict, config, strict=False)
        params = _merge_params(jax.device_get(init_params), loaded)
        n_loaded = len(jax.tree.leaves(loaded))
        n_total = len(jax.tree.leaves(params))
        logger.info("Loaded %d/%d parameter tensors from %s", n_loaded, n_total, weights_path)
    else:
        params = init_params
        logger.info("No model.safetensors at %s — random init", path)
    return config, module, params
