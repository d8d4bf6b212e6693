"""Pruning head: dropout + Linear(hidden, 2) token classifier.

JAX counterpart of the reference ``OpenProvenceHead``
(open_provence/models/open_provence_head.py:52-145; minimal inference copy at
modeling_open_provence_standalone.py:407-448). The inference path ignores
sentence boundaries — sentence aggregation happens in the process engine via
segment mean-pooling (ops/segment.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..configs import PruningHeadConfig


class PruningHead(nn.Module):
    config: PruningHeadConfig

    @nn.compact
    def __call__(
        self, hidden_states: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        x = hidden_states
        if cfg.classifier_dropout > 0.0:
            x = nn.Dropout(cfg.classifier_dropout)(x, deterministic=deterministic)
        return nn.Dense(cfg.num_labels, name="classifier")(x)
