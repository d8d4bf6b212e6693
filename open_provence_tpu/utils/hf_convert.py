"""Checkpoint conversion between HF/torch state dicts and Flax param trees.

Understands the three layouts the reference emits or accepts
(encoder.py:1040-1094, standalone:1452-1464, utils/model_architecture.py):

* merged checkpoints: ``ranking_model.*`` + ``pruning_head.*`` keys,
* legacy root-level keys (no ``ranking_model.`` prefix) — auto-prefixed,
* flat ModernBERT backbones missing the ``model.`` prefix — auto-prefixed
  (skip ``pruning_head``/``head``/``classifier`` keys).

Torch ``nn.Linear`` stores [out, in]; Flax ``Dense`` kernels are [in, out]
(transposed). LayerNorm ``weight``→``scale``. Embedding ``weight``→
``embedding``.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from ..configs import ModernBertBackboneConfig, OpenProvenceConfig

logger = logging.getLogger(__name__)

ARCHITECTURE_FINGERPRINTS = {
    "modernbert": ("tok_embeddings", "attn.Wqkv", "mlp_norm"),
    "bert": ("word_embeddings", "encoder.layer", "LayerNorm"),
    "roberta": ("roberta.embeddings", "roberta.encoder"),
}


def detect_architecture(keys: list[str]) -> str:
    """Fingerprint the backbone family from state-dict keys
    (mirrors reference utils/model_architecture.py:39-73)."""
    for arch, identifiers in ARCHITECTURE_FINGERPRINTS.items():
        if all(any(ident in key for key in keys) for ident in identifiers):
            return arch
    joined = " ".join(keys)
    if "tok_embeddings" in joined and "Wqkv" in joined:
        return "modernbert"
    if any(k.startswith("bert.") for k in keys):
        return "bert"
    if any(k.startswith("roberta.") for k in keys):
        return "roberta"
    return "unknown"


def normalize_state_dict(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Normalize any accepted layout to merged ``ranking_model.*`` +
    ``pruning_head.*`` keys with the ``model.`` backbone prefix present."""
    sd = dict(state_dict)

    # Legacy: root-level keys → prefix everything but pruning_head with
    # ranking_model. (standalone:1452-1464).
    if not any(k.startswith("ranking_model.") for k in sd):
        sd = {
            (k if k.startswith("pruning_head.") else f"ranking_model.{k}"): v
            for k, v in sd.items()
        }

    # ModernBERT flat structure fix: insert "model." after "ranking_model."
    # when the backbone keys are flat (utils/model_architecture.py:75-100).
    inner = [k[len("ranking_model."):] for k in sd if k.startswith("ranking_model.")]
    has_model_prefix = any(k.startswith("model.") for k in inner)
    has_flat = any(k.startswith(("embeddings.", "layers.")) for k in inner)
    if has_flat and not has_model_prefix:
        fixed = {}
        for key, value in sd.items():
            if key.startswith("ranking_model.") and not any(
                part in key for part in ("pruning_head", ".head.", ".classifier.")
            ):
                fixed[f"ranking_model.model.{key[len('ranking_model.'):]}"] = value
            else:
                fixed[key] = value
        sd = fixed
    return sd


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def hf_to_flax_params(
    state_dict: Mapping[str, Any],
    config: OpenProvenceConfig,
    *,
    strict: bool = True,
) -> dict[str, Any]:
    """Convert a merged torch-layout state dict to the Flax param tree of
    ``OpenProvenceModule``. With ``strict=False``, missing source keys are
    skipped (partial init from a backbone-only checkpoint)."""
    sd = normalize_state_dict(state_dict)
    backbone = config.backbone()
    params: dict[str, Any] = {}

    def arr(key: str) -> np.ndarray:
        value = sd[key]
        if hasattr(value, "detach"):  # torch tensor
            value = value.detach().cpu().float().numpy()
        return np.asarray(value)

    def linear(src: str, dst: tuple[str, ...], bias: bool) -> None:
        if f"{src}.weight" not in sd:
            if strict:
                raise KeyError(f"{src}.weight missing from state dict")
            return
        _set(params, dst + ("kernel",), arr(f"{src}.weight").T)
        if bias and f"{src}.bias" in sd:
            _set(params, dst + ("bias",), arr(f"{src}.bias"))

    def layernorm(src: str, dst: tuple[str, ...], bias: bool) -> None:
        if f"{src}.weight" not in sd:
            if strict:
                raise KeyError(f"{src}.weight missing from state dict")
            return
        _set(params, dst + ("scale",), arr(f"{src}.weight"))
        if bias and f"{src}.bias" in sd:
            _set(params, dst + ("bias",), arr(f"{src}.bias"))

    rb = "ranking_model.model"
    rm = ("ranking_model", "model")
    if f"{rb}.embeddings.tok_embeddings.weight" in sd:
        _set(
            params,
            rm + ("embeddings", "tok_embeddings", "embedding"),
            arr(f"{rb}.embeddings.tok_embeddings.weight"),
        )
    elif strict:
        raise KeyError(f"{rb}.embeddings.tok_embeddings.weight missing from state dict")
    layernorm(f"{rb}.embeddings.norm", rm + ("embeddings", "norm"), backbone.norm_bias)

    for i in range(backbone.num_hidden_layers):
        src = f"{rb}.layers.{i}"
        dst = rm + (f"layers_{i}",)
        if i != 0:
            layernorm(f"{src}.attn_norm", dst + ("attn_norm",), backbone.norm_bias)
        linear(f"{src}.attn.Wqkv", dst + ("attn", "Wqkv"), backbone.attention_bias)
        linear(f"{src}.attn.Wo", dst + ("attn", "Wo"), backbone.attention_bias)
        layernorm(f"{src}.mlp_norm", dst + ("mlp_norm",), backbone.norm_bias)
        linear(f"{src}.mlp.Wi", dst + ("mlp", "Wi"), backbone.mlp_bias)
        linear(f"{src}.mlp.Wo", dst + ("mlp", "Wo"), backbone.mlp_bias)

    layernorm(f"{rb}.final_norm", rm + ("final_norm",), backbone.norm_bias)

    linear(
        "ranking_model.head.dense",
        ("ranking_model", "head", "dense"),
        backbone.classifier_bias,
    )
    layernorm(
        "ranking_model.head.norm", ("ranking_model", "head", "norm"), backbone.norm_bias
    )
    linear("ranking_model.classifier", ("ranking_model", "classifier"), True)
    linear("pruning_head.classifier", ("pruning_head", "classifier"), True)
    return params


def flax_params_to_hf(params: Mapping[str, Any], config: OpenProvenceConfig) -> dict[str, np.ndarray]:
    """Inverse of ``hf_to_flax_params`` — export to the merged reference
    checkpoint layout (encoder.py:1040-1094) for HF interop."""
    backbone = config.backbone()
    sd: dict[str, np.ndarray] = {}

    def get(path: tuple[str, ...]) -> np.ndarray:
        node: Any = params
        for part in path:
            node = node[part]
        return np.asarray(node)

    def linear(dst: str, src: tuple[str, ...], bias: bool) -> None:
        sd[f"{dst}.weight"] = np.ascontiguousarray(get(src + ("kernel",)).T)
        if bias:
            node: Any = params
            for part in src:
                node = node[part]
            if "bias" in node:
                sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def layernorm(dst: str, src: tuple[str, ...], bias: bool) -> None:
        sd[f"{dst}.weight"] = get(src + ("scale",))
        if bias:
            node: Any = params
            for part in src:
                node = node[part]
            if "bias" in node:
                sd[f"{dst}.bias"] = np.asarray(node["bias"])

    rb = "ranking_model.model"
    rm = ("ranking_model", "model")
    sd[f"{rb}.embeddings.tok_embeddings.weight"] = get(
        rm + ("embeddings", "tok_embeddings", "embedding")
    )
    layernorm(f"{rb}.embeddings.norm", rm + ("embeddings", "norm"), backbone.norm_bias)
    for i in range(backbone.num_hidden_layers):
        dst = f"{rb}.layers.{i}"
        src = rm + (f"layers_{i}",)
        if i != 0:
            layernorm(f"{dst}.attn_norm", src + ("attn_norm",), backbone.norm_bias)
        linear(f"{dst}.attn.Wqkv", src + ("attn", "Wqkv"), backbone.attention_bias)
        linear(f"{dst}.attn.Wo", src + ("attn", "Wo"), backbone.attention_bias)
        layernorm(f"{dst}.mlp_norm", src + ("mlp_norm",), backbone.norm_bias)
        linear(f"{dst}.mlp.Wi", src + ("mlp", "Wi"), backbone.mlp_bias)
        linear(f"{dst}.mlp.Wo", src + ("mlp", "Wo"), backbone.mlp_bias)
    layernorm(f"{rb}.final_norm", rm + ("final_norm",), backbone.norm_bias)
    linear(
        "ranking_model.head.dense",
        ("ranking_model", "head", "dense"),
        backbone.classifier_bias,
    )
    layernorm(
        "ranking_model.head.norm", ("ranking_model", "head", "norm"), backbone.norm_bias
    )
    linear("ranking_model.classifier", ("ranking_model", "classifier"), True)
    linear("pruning_head.classifier", ("pruning_head", "classifier"), True)
    return sd


def load_safetensors_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return dict(load_file(str(path)))


def save_safetensors_state_dict(sd: Mapping[str, np.ndarray], path: str | Path) -> None:
    from safetensors.numpy import save_file

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))


def load_checkpoint(directory: str | Path) -> tuple[OpenProvenceConfig, dict[str, Any]]:
    """Load an OpenProvence checkpoint directory (reference layout: config.json
    + model.safetensors) into (config, flax params)."""
    directory = Path(directory)
    config = OpenProvenceConfig.load(directory)
    weights_path = directory / "model.safetensors"
    if not weights_path.exists():
        raise FileNotFoundError(f"model.safetensors not found in {directory}")
    state_dict = load_safetensors_state_dict(weights_path)
    params = hf_to_flax_params(state_dict, config)
    return config, params


def config_from_hf_checkpoint(directory: str | Path) -> OpenProvenceConfig:
    """Build an OpenProvenceConfig from a reference checkpoint's config.json."""
    directory = Path(directory)
    raw = json.loads((directory / "config.json").read_text())
    return OpenProvenceConfig.from_dict(raw)


def backbone_config_from_hf(directory_or_dict: str | Path | dict) -> ModernBertBackboneConfig:
    if isinstance(directory_or_dict, dict):
        return ModernBertBackboneConfig.from_hf_dict(directory_or_dict)
    raw = json.loads((Path(directory_or_dict) / "config.json").read_text())
    return ModernBertBackboneConfig.from_hf_dict(raw)
