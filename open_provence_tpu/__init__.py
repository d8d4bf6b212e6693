"""open_provence_tpu — TPU-native Provence-style reranker–pruner framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference OpenProvence project: cross-encoders that simultaneously score a
query–context pair for relevance and emit per-token keep/prune probabilities
used to delete irrelevant sentences from RAG context.
"""

from .configs import (
    DEFAULT_PROCESS_THRESHOLD,
    ModernBertBackboneConfig,
    OpenProvenceConfig,
    PruningHeadConfig,
)
from .data_structures import (
    OpenProvenceOnlyOutput,
    OpenProvenceOutput,
    RerankingOpenProvenceOutput,
)
from .models.model import (
    OpenProvenceModule,
    build_module,
    keep_probs_from_logits,
    ranking_score_from_logits,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy heavy imports so `import open_provence_tpu` stays light; the
    # exported names mirror the reference package __init__ (collator, loss,
    # trainer, encoder, structures — reference __init__.py:24-34).
    if name == "OpenProvenceEncoder":
        from .encoder import OpenProvenceEncoder

        return OpenProvenceEncoder
    if name == "OpenProvenceModel":
        from .inference import OpenProvenceModel

        return OpenProvenceModel
    if name == "OpenProvenceDataCollator":
        from .train.collator import OpenProvenceDataCollator

        return OpenProvenceDataCollator
    if name == "OpenProvenceLoss":
        from .train.losses import OpenProvenceLoss

        return OpenProvenceLoss
    if name == "OpenProvenceTrainer":
        from .train.trainer import OpenProvenceTrainer

        return OpenProvenceTrainer
    if name == "runner":
        from .train import runner

        return runner
    if name in (
        "OpenProvenceForSequenceClassification",
        "OpenProvenceForTokenClassification",
    ):
        from .models import hf_wrappers

        return getattr(hf_wrappers, name)
    raise AttributeError(name)

__all__ = [
    "DEFAULT_PROCESS_THRESHOLD",
    "ModernBertBackboneConfig",
    "OpenProvenceConfig",
    "PruningHeadConfig",
    "OpenProvenceModule",
    "OpenProvenceEncoder",
    "OpenProvenceModel",
    "OpenProvenceForSequenceClassification",
    "OpenProvenceForTokenClassification",
    "OpenProvenceOutput",
    "OpenProvenceOnlyOutput",
    "RerankingOpenProvenceOutput",
    "build_module",
    "keep_probs_from_logits",
    "ranking_score_from_logits",
    "__version__",
]
