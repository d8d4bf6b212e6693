"""Preprocess loader auto-tuning (reference standalone:2521-2623 heuristics)."""

import os
from unittest import mock

from open_provence_tpu.inference.preprocess_tuning import (
    auto_tune_preprocess_loader,
    default_preprocess_workers,
    estimate_device_memory_bytes,
    resolve_preprocess_workers,
)


def test_default_workers_is_cpu_minus_one():
    cpus = os.cpu_count()
    assert default_preprocess_workers() == max(0, (cpus or 1) - 1)


def test_resolve_workers_precedence():
    assert resolve_preprocess_workers(3) == 3
    assert resolve_preprocess_workers(0) == 0
    with mock.patch.dict(os.environ, {"OPEN_PROVENCE_PREPROCESS_WORKERS": "5"}):
        assert resolve_preprocess_workers(None) == 5
        assert resolve_preprocess_workers(2) == 2  # explicit beats env
    with mock.patch.dict(os.environ, {"OPEN_PROVENCE_PREPROCESS_WORKERS": "junk"}):
        assert resolve_preprocess_workers(None) is None
    with mock.patch.dict(os.environ, {}, clear=True):
        assert resolve_preprocess_workers(None) is None


def test_device_memory_env_override():
    with mock.patch.dict(os.environ, {"OPEN_PROVENCE_DEVICE_MEMORY_GB": "16"}):
        assert estimate_device_memory_bytes() == 16 * 1024**3
    with mock.patch.dict(os.environ, {"OPEN_PROVENCE_DEVICE_MEMORY_GB": "junk"}, clear=True):
        # falls through to device stats (may be None on CPU) without raising
        estimate_device_memory_bytes(device=None)


class _FakeDevice:
    def __init__(self, limit):
        self._limit = limit

    def memory_stats(self):
        return {"bytes_limit": self._limit} if self._limit else {}


def test_device_memory_from_device_stats():
    with mock.patch.dict(os.environ, {}, clear=True):
        assert estimate_device_memory_bytes(_FakeDevice(8 << 30)) == 8 << 30
        assert estimate_device_memory_bytes(_FakeDevice(None)) is None


def test_small_runs_stay_single_threaded():
    workers, batch, prefetch = auto_tune_preprocess_loader(
        total_jobs=100,
        inference_batch_size=32,
        current_workers=None,
        current_preprocess_batch=None,
    )
    assert workers == 0
    assert prefetch is None
    assert 1 <= batch <= 100


def test_large_runs_parallelize_and_prefetch():
    workers, batch, prefetch = auto_tune_preprocess_loader(
        total_jobs=10_000,
        inference_batch_size=64,
        current_workers=None,
        current_preprocess_batch=None,
        device_memory_bytes=24 << 30,
    )
    cpu_limit = default_preprocess_workers()
    if cpu_limit > 0:
        assert workers == min(cpu_limit, 10_000)
        assert prefetch == max(2, min(8, -(-batch // workers)))
    # device ≥20 GB tier caps preprocess batch at 192, then at batch_size
    assert batch == min(192, 64)


def test_device_memory_tiers():
    for mem_gb, cap in [(8, 64), (16, 128), (40, 192)]:
        _, batch, _ = auto_tune_preprocess_loader(
            total_jobs=10_000,
            inference_batch_size=1024,
            current_workers=0,
            current_preprocess_batch=None,
            device_memory_bytes=mem_gb << 30,
        )
        assert batch == cap, (mem_gb, batch)


def test_no_device_memory_fallback_cap():
    _, batch, _ = auto_tune_preprocess_loader(
        total_jobs=10_000,
        inference_batch_size=1024,
        current_workers=0,
        current_preprocess_batch=None,
        device_memory_bytes=None,
    )
    assert batch == 96  # min(96, max(32, 1024))


def test_explicit_values_are_pinned():
    workers, batch, prefetch = auto_tune_preprocess_loader(
        total_jobs=50,
        inference_batch_size=32,
        current_workers=7,
        current_preprocess_batch=11,
        current_prefetch=3,
    )
    assert (workers, batch, prefetch) == (7, 11, 3)


def test_process_accepts_tuning_kwargs():
    """End-to-end: process() runs with explicit workers + preprocess batch."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import jax
    import numpy as np
    from dummy_tokenizers import DummyTokenizer

    import open_provence_tpu as op
    from open_provence_tpu.inference import OpenProvenceModel

    backbone = op.ModernBertBackboneConfig(
        vocab_size=65536, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=128, local_attention=16,
        pad_token_id=0, num_labels=1,
    )
    config = op.OpenProvenceConfig(
        base_model_config=backbone.to_dict(), num_labels=1,
        pruning_config={"hidden_size": 32, "classifier_dropout": 0.0},
        max_length=64,
    )
    module = op.build_module(config)
    params = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 8), np.int32),
        np.ones((1, 8), np.int32), attention_impl="xla",
    )["params"]
    model = OpenProvenceModel(
        config, params, DummyTokenizer(), attention_impl="xla", bucket_step=16
    )
    out = model.process(
        "q?",
        ["First sentence. Second one.", "Another doc. More text."],
        threshold=0.0,
        show_progress=False,
        preprocess_workers=2,
        preprocess_batch_size=1,
    )
    assert out["pruned_context"] == [
        "First sentence. Second one.",
        "Another doc. More text.",
    ]
