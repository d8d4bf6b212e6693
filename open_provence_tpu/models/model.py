"""The two-head OpenProvence cross-encoder module.

One encoder forward produces simultaneously (reference
modeling_open_provence_standalone.py:1666-1739):

1. ranking logits — sequence-classification head on the pooled final hidden
   state (score = sigmoid of logits[..., 0] by the Provence convention,
   reference encoder.py:317-326), and
2. pruning logits — token-classification head on the *pre-final-norm* last
   hidden states ([B, S, 2]; keep-prob = softmax[..., 1]).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..configs import ModernBertBackboneConfig, OpenProvenceConfig, PruningHeadConfig
from .heads import PruningHead
from .modernbert import ModernBertForSequenceClassification


class OpenProvenceModule(nn.Module):
    """ranking_model (ModernBERT + classifier) + pruning_head."""

    backbone_config: ModernBertBackboneConfig
    pruning_config: PruningHeadConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
        attention_impl: str = "auto",
        remat: bool = False,
    ) -> dict[str, Any]:
        outputs = ModernBertForSequenceClassification(
            self.backbone_config, name="ranking_model"
        )(
            input_ids,
            attention_mask,
            deterministic=deterministic,
            attention_impl=attention_impl,
            remat=remat,
        )
        pruning_logits = PruningHead(self.pruning_config, name="pruning_head")(
            outputs["last_hidden_pre_norm"], deterministic=deterministic
        )
        return {
            "ranking_logits": outputs["logits"],
            "pruning_logits": pruning_logits,
            "last_hidden_pre_norm": outputs["last_hidden_pre_norm"],
            "last_hidden_state": outputs["last_hidden_state"],
        }


def build_module(config: OpenProvenceConfig) -> OpenProvenceModule:
    return OpenProvenceModule(
        backbone_config=config.backbone(),
        pruning_config=config.pruning_head(),
    )


def ranking_score_from_logits(ranking_logits: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(logits[..., 0]) — the Provence scoring convention for both
    1-label and 2-label heads (reference encoder.py:317-326,
    standalone:2913-2916). Computed in fp32 (standalone:2900-2903)."""
    logits = ranking_logits.astype(jnp.float32)
    if logits.ndim >= 2 and logits.shape[-1] >= 1:
        logits = logits[..., 0]
    return 1.0 / (1.0 + jnp.exp(-logits))


def keep_probs_from_logits(pruning_logits: jnp.ndarray) -> jnp.ndarray:
    """softmax(logits)[..., 1] in fp32 — per-token keep probability
    (standalone:2918-2924)."""
    logits = pruning_logits.astype(jnp.float32)
    logits = logits - logits.max(axis=-1, keepdims=True)
    exp = jnp.exp(logits)
    probs = exp / exp.sum(axis=-1, keepdims=True)
    return probs[..., 1]
