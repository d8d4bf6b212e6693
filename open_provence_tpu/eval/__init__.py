from .datasets_eval import (
    EvalConfig,
    build_markdown,
    evaluate_dataset,
    extract_sentences,
    infer_predictions,
    normalize_relevance,
    run_evaluation,
)

__all__ = [
    "EvalConfig",
    "build_markdown",
    "evaluate_dataset",
    "extract_sentences",
    "infer_predictions",
    "normalize_relevance",
    "run_evaluation",
]
