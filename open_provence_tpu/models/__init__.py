from .heads import PruningHead
from .model import OpenProvenceModule, build_module
from .modernbert import (
    ModernBertEncoder,
    ModernBertForSequenceClassification,
)

__all__ = [
    "PruningHead",
    "OpenProvenceModule",
    "build_module",
    "ModernBertEncoder",
    "ModernBertForSequenceClassification",
]
