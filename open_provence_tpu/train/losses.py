"""Joint ranking + pruning loss (JAX).

Semantics match the reference ``OpenProvenceLoss``
(open_provence/losses.py):

* ranking — MSE on RAW logits of class 0 vs teacher scores ("Provence:
  (s_n − z_{n,0})²", :171-188), weight 0.05; BCE-with-logits alternative for
  classification mode (:56-59),
* pruning — token CE with ignore_index −100 (:61, :195-241), weight 1.0,
* all-ignored batches → zero loss; non-finite loss → 0.001 guard
  (:219-239).

Implemented as pure functions of (model outputs, batch) so they compose
under jit/grad; loss components are returned for logging (the reference's
``last_loss_components``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ranking_loss(
    ranking_logits: jnp.ndarray,  # [P, num_labels] or [P]
    targets: jnp.ndarray,  # [P] float
    pair_mask: jnp.ndarray,  # [P] float 1=real
    *,
    is_regression: bool = True,
    use_raw_logits: bool = True,
) -> jnp.ndarray:
    logits = ranking_logits
    if logits.ndim > 1:
        scores = logits[..., 0]
    else:
        scores = logits
    scores = scores.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    denom = jnp.maximum(pair_mask.sum(), 1.0)
    if is_regression and use_raw_logits:
        per_pair = (scores - targets) ** 2
    elif is_regression:
        per_pair = (jax.nn.sigmoid(scores) - targets) ** 2
    else:
        # BCE with logits.
        per_pair = (
            jnp.maximum(scores, 0.0) - scores * targets + jnp.log1p(jnp.exp(-jnp.abs(scores)))
        )
    return (per_pair * pair_mask).sum() / denom


def pruning_loss(
    pruning_logits: jnp.ndarray,  # [P, L, 2]
    pruning_labels: jnp.ndarray,  # [P, L] int with -100 ignore
    pair_mask: jnp.ndarray,  # [P]
) -> jnp.ndarray:
    logits = pruning_logits.astype(jnp.float32)
    valid = (pruning_labels != -100) & (pair_mask[:, None] > 0)
    labels = jnp.where(valid, pruning_labels, 0)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)[..., 0]
    num_valid = valid.sum()
    loss = -jnp.where(valid, picked, 0.0).sum() / jnp.maximum(num_valid, 1)
    # All-ignored → 0; NaN guard → 0.001 (reference losses.py:219-239).
    loss = jnp.where(num_valid == 0, 0.0, loss)
    loss = jnp.where(jnp.isfinite(loss), loss, 0.001)
    return loss


def joint_loss(
    outputs: dict[str, jnp.ndarray],
    batch: dict[str, jnp.ndarray],
    *,
    ranking_weight: float = 0.05,
    pruning_weight: float = 1.0,
    is_regression: bool = True,
    use_raw_logits: bool = True,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    r_loss = ranking_loss(
        outputs["ranking_logits"],
        batch["ranking_targets"],
        batch["pair_mask"],
        is_regression=is_regression,
        use_raw_logits=use_raw_logits,
    )
    p_loss = pruning_loss(
        outputs["pruning_logits"], batch["pruning_labels"], batch["pair_mask"]
    )
    total = ranking_weight * r_loss + pruning_weight * p_loss
    return total, {"ranking_loss": r_loss, "pruning_loss": p_loss}


class OpenProvenceLoss:
    """Stateful wrapper over joint_loss mirroring the reference class API
    (losses.py:15-127): call with (outputs, batch), read
    ``last_loss_components`` for logging. Note: unlike the reference, the
    model forward runs outside (functional JAX style) — pass its output
    dict here."""

    def __init__(
        self,
        model=None,
        ranking_loss_fn=None,
        pruning_loss_fn=None,
        ranking_weight: float = 0.05,
        pruning_weight: float = 1.0,
        is_regression: bool = True,
        use_raw_logits: bool = True,
    ):
        del model, ranking_loss_fn, pruning_loss_fn  # functional equivalents built in
        self.ranking_weight = ranking_weight
        self.pruning_weight = pruning_weight
        self.is_regression = is_regression
        self.use_raw_logits = use_raw_logits
        self.last_loss_components: dict[str, float] = {}

    def __call__(self, outputs, batch):
        total, components = joint_loss(
            outputs,
            batch,
            ranking_weight=self.ranking_weight,
            pruning_weight=self.pruning_weight,
            is_regression=self.is_regression,
            use_raw_logits=self.use_raw_logits,
        )
        self.last_loss_components = components
        return total
