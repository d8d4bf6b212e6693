"""AutoModel-style wrapper classes over the two-head cross-encoder.

The reference exposes ``OpenProvenceForSequenceClassification`` and
``OpenProvenceForTokenClassification`` via HF ``auto_map`` so checkpoints
load through ``AutoModel.from_pretrained(..., trust_remote_code=True)``
(reference encoder.py:1079-1085, modeling_open_provence_standalone.py:
3814-3903). transformers cannot instantiate JAX modules through that hook,
so the TPU build keeps the *class surface* — same names, same call
semantics, same loss paths — as plain Python classes reachable both from
the installed package and from the standalone checkpoint bundle's shim
(the bundle replaces trust_remote_code as the no-install load path; see
utils/modeling_export.py). Exported configs still carry ``architectures``
+ ``auto_map`` metadata pointing at the bundle shim for parity and
discoverability.

Loss parity:
  * sequence classification (standalone:1707-1716): ``num_labels == 1`` →
    mean BCE-with-logits on ``ranking_logits.reshape(-1)``; otherwise mean
    CE over ``num_labels`` classes (ignore_index −100, torch default).
  * token classification (standalone:3852-3881): CE over pruning logits
    restricted to ``attention_mask == 1`` positions; zero loss when no
    position is active; −100 labels ignored (torch ``CrossEntropyLoss``
    default).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

from ..configs import OpenProvenceConfig
from .model import OpenProvenceModule


@dataclass
class SequenceClassifierOutput:
    """Mirror of transformers' output: ``logits`` are the ranking logits;
    the pruning logits ride along as an extra field (standalone:1725-1731)."""

    loss: jnp.ndarray | None
    logits: jnp.ndarray
    ranking_logits: jnp.ndarray
    pruning_logits: jnp.ndarray
    hidden_states: jnp.ndarray | None = None


@dataclass
class TokenClassifierOutput:
    """``logits`` are the pruning logits; ranking logits ride along
    (standalone:3893-3902)."""

    loss: jnp.ndarray | None
    logits: jnp.ndarray
    ranking_logits: jnp.ndarray
    hidden_states: jnp.ndarray | None = None


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE in fp32, −100 → 0 contribution. Returns (losses, valid)."""
    logits = logits.astype(jnp.float32)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    return jnp.where(valid, logz - picked, 0.0), valid


class OpenProvenceForSequenceClassification:
    """Ranking-logits view of the checkpoint (AutoModel surface parity)."""

    def __init__(
        self,
        config: OpenProvenceConfig,
        params: Mapping[str, Any],
        *,
        dtype: Any = None,
        attention_impl: str = "auto",
    ):
        self.config = config
        self.num_labels = int(config.num_labels)
        self.module = OpenProvenceModule(
            backbone_config=config.backbone(),
            pruning_config=config.pruning_head(),
        )
        if dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else x,
                params,
            )
        self.params = jax.tree.map(jnp.asarray, dict(params))
        self.attention_impl = attention_impl
        self._jit_cache: dict[tuple[int, int], Callable] = {}

    @classmethod
    def from_pretrained(
        cls, path: str | Path, **kwargs: Any
    ) -> "OpenProvenceForSequenceClassification":
        """Load a reference-layout checkpoint directory (config.json +
        merged ``ranking_model.*``/``pruning_head.*`` safetensors)."""
        from ..utils.hf_convert import load_checkpoint

        config, params = load_checkpoint(path)
        return cls(config, params, **kwargs)

    def _forward_fn(self, batch: int, seq_len: int) -> Callable:
        key = (batch, seq_len)
        fn = self._jit_cache.get(key)
        if fn is None:
            module, impl = self.module, self.attention_impl

            def _build() -> Callable:
                def _run(params, input_ids, attention_mask):
                    out = module.apply(
                        {"params": params},
                        input_ids,
                        attention_mask,
                        deterministic=True,
                        attention_impl=impl,
                    )
                    return out["ranking_logits"], out["pruning_logits"]

                return jax.jit(_run)

            from ..utils.jit_cache import shared_jit

            fn = shared_jit(("hf_wrapper_forward", module, impl), _build)
            self._jit_cache[key] = fn
        return fn

    def _forward(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray | None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        input_ids = jnp.asarray(input_ids)
        if input_ids.ndim == 1:
            input_ids = input_ids[None, :]
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, dtype=jnp.int32)
        attention_mask = jnp.asarray(attention_mask).reshape(input_ids.shape)
        fn = self._forward_fn(*input_ids.shape)
        return fn(self.params, input_ids, attention_mask)

    def _loss(
        self, ranking_logits: jnp.ndarray, labels: jnp.ndarray
    ) -> jnp.ndarray:
        labels = jnp.asarray(labels)
        if self.num_labels == 1:
            logits = ranking_logits.astype(jnp.float32).reshape(-1)
            targets = labels.astype(jnp.float32).reshape(-1)
            # BCEWithLogits: max(x,0) − x·y + log(1+exp(−|x|))
            loss = (
                jnp.maximum(logits, 0.0)
                - logits * targets
                + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return loss.mean()
        losses, valid = _cross_entropy(
            ranking_logits.reshape(-1, self.num_labels), labels.reshape(-1)
        )
        return losses.sum() / valid.sum()

    def __call__(
        self,
        input_ids: jnp.ndarray | None = None,
        attention_mask: jnp.ndarray | None = None,
        labels: jnp.ndarray | None = None,
        return_dict: bool | None = None,
        **kwargs: Any,
    ):
        if input_ids is None:
            raise ValueError("input_ids must be provided")
        ranking_logits, pruning_logits = self._forward(input_ids, attention_mask)
        loss = self._loss(ranking_logits, labels) if labels is not None else None
        if return_dict is False:
            out: tuple[jnp.ndarray, ...] = (ranking_logits, pruning_logits)
            return (loss,) + out if loss is not None else out
        return SequenceClassifierOutput(
            loss=loss,
            logits=ranking_logits,
            ranking_logits=ranking_logits,
            pruning_logits=pruning_logits,
        )

    # transformers-style alias
    forward = __call__


class OpenProvenceForTokenClassification(OpenProvenceForSequenceClassification):
    """Pruning-logits view with the masked token-CE loss
    (standalone:3834-3903)."""

    def __init__(self, config: OpenProvenceConfig, params: Mapping[str, Any], **kw):
        super().__init__(config, params, **kw)
        self.num_labels = int(config.num_pruning_labels)

    def __call__(
        self,
        input_ids: jnp.ndarray | None = None,
        attention_mask: jnp.ndarray | None = None,
        labels: jnp.ndarray | None = None,
        return_dict: bool | None = None,
        **kwargs: Any,
    ):
        if input_ids is None:
            raise ValueError("input_ids must be provided")
        ranking_logits, pruning_logits = self._forward(input_ids, attention_mask)
        loss = None
        if labels is not None:
            labels = jnp.asarray(labels).reshape(pruning_logits.shape[:-1])
            if attention_mask is not None:
                active = jnp.asarray(attention_mask).reshape(labels.shape) == 1
                labels = jnp.where(active, labels, -100)
                n_active = active.sum()
            else:
                n_active = jnp.asarray(labels.size)
            losses, valid = _cross_entropy(
                pruning_logits.reshape(-1, self.num_labels), labels.reshape(-1)
            )
            # No active position → 0.0 (standalone:3876-3878); active but all
            # −100 → NaN, matching torch CrossEntropyLoss semantics.
            loss = jnp.where(n_active > 0, losses.sum() / valid.sum(), 0.0)
        if return_dict is False:
            out: tuple[jnp.ndarray, ...] = (pruning_logits,)
            return (loss,) + out if loss is not None else out
        return TokenClassifierOutput(
            loss=loss,
            logits=pruning_logits,
            ranking_logits=ranking_logits,
        )

    forward = __call__


# Exported-config metadata: the reference writes these so checkpoints are
# self-describing (encoder.py:1079-1085). The module path points at the
# bundle shim written next to exported weights.
ARCHITECTURES = ["OpenProvenceForSequenceClassification"]
AUTO_MAP = {
    "AutoConfig": "modeling_open_provence_tpu.OpenProvenceConfig",
    "AutoModel": "modeling_open_provence_tpu.OpenProvenceForSequenceClassification",
    "AutoModelForSequenceClassification": (
        "modeling_open_provence_tpu.OpenProvenceForSequenceClassification"
    ),
    "AutoModelForTokenClassification": (
        "modeling_open_provence_tpu.OpenProvenceForTokenClassification"
    ),
}
