"""External-baseline adapters for eval_mldr.

Counterpart of the reference's naver-provence support in
scripts/eval_mldr.py:34 (detection regex), :68-74 (routing) and :75-125
(``_prepare_naver_provence_model``): the published
``naver/provence-reranker-debertav3-v1`` baseline is a torch ``AutoModel``
with ``trust_remote_code`` whose ``process()`` signature matches ours, so the
MLDR harness can produce apples-to-apples rows for eval_report.md:44.

Torch-side by necessity (the baseline ships torch remote code); everything is
gated on torch availability and exercised with fakes in tests — loading the
real checkpoint needs network access.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path
from typing import Any, Callable

NAVER_PROVENCE_PATTERN = re.compile(r"^naver/.*provence.*", re.IGNORECASE)


def is_naver_provence_model(model_identifier: str, *, is_local: bool | None = None) -> bool:
    """True for hub ids like ``naver/provence-reranker-debertav3-v1``
    (reference eval_mldr.py:68-74). Local checkpoint paths never match."""
    if is_local is None:
        is_local = Path(model_identifier).expanduser().exists()
    if is_local:
        return False
    return bool(NAVER_PROVENCE_PATTERN.search(model_identifier.strip()))


def prepare_naver_provence_model(
    model: Any,
    *,
    max_length: int | None = None,
    disable_progress: bool = False,
) -> Callable[..., dict[str, Any]]:
    """Wrap a loaded naver-provence torch model into a ``process()`` callable
    (reference eval_mldr.py:75-125):

    * bf16 ``ranking_scores`` / ``compression_logits`` forward outputs are
      upcast to fp32 (the remote code breaks on bf16 numpy conversion),
    * ``max_length`` propagates to ``model.max_len`` and the config,
    * the remote module's tqdm is no-op'd when progress is disabled.
    """
    import torch

    original_forward = type(model).forward

    def forward_with_cast(self, *args: Any, **kwargs: Any):
        output = original_forward(self, *args, **kwargs)
        for key in ("ranking_scores", "compression_logits"):
            try:
                value = output[key]
            except (KeyError, TypeError):
                continue
            if isinstance(value, torch.Tensor) and value.dtype == torch.bfloat16:
                output[key] = value.to(dtype=torch.float32)
        return output

    model.forward = forward_with_cast.__get__(model, type(model))

    if max_length is not None:
        if hasattr(model, "max_len"):
            model.max_len = max_length
        if hasattr(getattr(model, "config", None), "max_position_embeddings"):
            model.config.max_position_embeddings = max_length

    if disable_progress:
        module = sys.modules.get(model.__class__.__module__)

        def _noop_tqdm(iterable, *args: Any, **kwargs: Any):
            return iterable

        if module is not None and hasattr(module, "tqdm"):
            setattr(module, "tqdm", _noop_tqdm)

    process_fn = getattr(model, "process", None)
    if not callable(process_fn):
        raise AttributeError(
            "Loaded Naver Provence model does not expose a callable 'process'."
        )
    return process_fn


def load_naver_process_fn(
    model_identifier: str,
    *,
    max_length: int | None = None,
    device: str | None = None,
    torch_dtype: Any = None,
    disable_progress: bool = False,
    auto_model_cls: Any = None,
) -> tuple[Callable[..., dict[str, Any]], Any]:
    """Load the baseline via ``AutoModel.from_pretrained(trust_remote_code)``
    and return (process_fn, model). Requires torch + network; tests inject
    ``auto_model_cls`` fakes."""
    if auto_model_cls is None:
        from transformers import AutoModel as auto_model_cls  # type: ignore[no-redef]

    kwargs: dict[str, Any] = {"trust_remote_code": True}
    if torch_dtype is not None:
        # Older transformers silently ignore an unknown ``dtype`` kwarg,
        # loading fp32 with no warning; ``torch_dtype`` is accepted by all
        # versions (a deprecated alias on current ones).
        kwargs["torch_dtype"] = torch_dtype
    model = auto_model_cls.from_pretrained(model_identifier, **kwargs)
    if device:
        model = model.to(device)
    model.eval()
    process_fn = prepare_naver_provence_model(
        model, max_length=max_length, disable_progress=disable_progress
    )
    return process_fn, model
