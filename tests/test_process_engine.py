"""process() input-shape contract and behavior tests.

Mirrors the reference's test coverage for the standalone engine
(tests/test_modeling_open_provence.py in the reference): str/list/aligned/
nested input shapes, title semantics, thresholds, sentence metrics, reorder/
top_k, and error cases — all offline with a tiny random model and a
char-ordinal DummyTokenizer.
"""

import jax
import numpy as np
import pytest

from open_provence_tpu.configs import (
    ModernBertBackboneConfig,
    OpenProvenceConfig,
)
from open_provence_tpu.inference import OpenProvenceModel
from open_provence_tpu.models.model import OpenProvenceModule

from tests.dummy_tokenizers import DummyTokenizer, ModernBertLikeTokenizer

VOCAB = 512  # char ordinals go up to ord(char)+10


def _tiny_model(tokenizer=None, max_length=64, default_threadshold=None):
    backbone = ModernBertBackboneConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=128,
        local_attention=16,
        global_attn_every_n_layers=3,
        pad_token_id=0,
        num_labels=1,
    )
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": 32, "classifier_dropout": 0.0},
        max_length=max_length,
        default_threadshold=default_threadshold,
    )
    module = OpenProvenceModule(
        backbone_config=config.backbone(), pruning_config=config.pruning_head()
    )
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    return OpenProvenceModel(
        config, params, tokenizer or DummyTokenizer(), attention_impl="xla",
        bucket_step=16,
    )


EN_SPLITTER = None  # use auto


@pytest.fixture(scope="module")
def model():
    return _tiny_model()


CONTEXT = "First sentence about sushi. Second one about work. Third about plants."


def test_process_str_shape(model):
    result = model.process("what food?", CONTEXT, show_progress=False)
    assert isinstance(result["pruned_context"], str)
    assert result["reranking_score"] is None or isinstance(
        result["reranking_score"], float
    )
    assert isinstance(result["compression_rate"], float)
    assert "timing" in result and "performance_trace" in result
    assert "kept_sentences" not in result


def test_process_list_shape(model):
    result = model.process(
        "q", [CONTEXT, "Another document. More text."], show_progress=False
    )
    assert isinstance(result["pruned_context"], list)
    assert len(result["pruned_context"]) == 2
    assert len(result["reranking_score"]) == 2


def test_process_aligned_shape(model):
    result = model.process(
        ["q1", "q2"], [CONTEXT, "Second doc text."], show_progress=False
    )
    assert isinstance(result["pruned_context"], list)
    assert len(result["pruned_context"]) == 2
    assert all(isinstance(x, str) for x in result["pruned_context"])


def test_process_nested_shape(model):
    result = model.process(
        ["q1", "q2"],
        [[CONTEXT, "extra doc."], ["Pre-split one.", "Pre-split two."]],
        show_progress=False,
    )
    assert len(result["pruned_context"]) == 2
    assert isinstance(result["pruned_context"][0], list)
    assert len(result["pruned_context"][0]) == 2


def test_process_shape_errors(model):
    with pytest.raises(ValueError):
        model.process(["q1", "q2"], [CONTEXT], show_progress=False)
    with pytest.raises(ValueError):
        model.process(["q1", "q2"], [[CONTEXT], "plain"], show_progress=False)


def test_threshold_zero_keeps_everything(model):
    result = model.process(
        "q", CONTEXT, threshold=0.0, show_progress=False,
        return_sentence_texts=True,
    )
    assert result["removed_sentences"] == []
    assert result["pruned_context"] == CONTEXT
    assert result["compression_rate"] == 0.0


def test_threshold_one_removes_everything(model):
    result = model.process("q", CONTEXT, threshold=1.0, show_progress=False)
    assert result["pruned_context"] == ""
    assert result["compression_rate"] == 100.0
    # zero_score_when_empty default
    assert result["reranking_score"] == 0.0


def test_zero_score_when_empty_disabled(model):
    result = model.process(
        "q", CONTEXT, threshold=1.0, zero_score_when_empty=False, show_progress=False
    )
    assert result["reranking_score"] != 0.0 or result["reranking_score"] is None


def test_sentence_metrics_and_texts(model):
    result = model.process(
        "q",
        CONTEXT,
        threshold=0.5,
        show_progress=False,
        return_sentence_metrics=True,
        return_sentence_texts=True,
    )
    probs = result["sentence_probabilities"]
    kept = result["kept_sentences"]
    removed = result["removed_sentences"]
    assert len(probs) == len(kept) + len(removed)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_explicit_title_prefix(model):
    result = model.process(
        "q",
        CONTEXT,
        title="Sushi Title",
        threshold=0.0,
        show_progress=False,
        return_sentence_texts=True,
    )
    assert result["title"] == "Sushi Title\n"
    # Title is a prefix sentence: excluded from pruned content text.
    assert result["pruned_context"] == CONTEXT


def test_always_select_title_first_sentence(model):
    result = model.process(
        "q",
        CONTEXT,
        title="first_sentence",
        always_select_title=True,
        threshold=0.99,
        show_progress=False,
        return_sentence_texts=True,
    )
    # Either nothing is above threshold (all removed) or the title sentence
    # is force-kept.
    if result["pruned_context"]:
        assert result["pruned_context"].startswith("First sentence")


def test_first_line_as_title(model):
    context = "Title Line\nBody sentence one. Body sentence two."
    result = model.process(
        "q", context, first_line_as_title=True, threshold=0.0, show_progress=False
    )
    assert result["title"] == "Title Line\n"
    assert "Title Line" not in result["pruned_context"]


def test_first_line_as_title_conflict(model):
    with pytest.raises(ValueError):
        model.process(
            "q", CONTEXT, title="explicit", first_line_as_title=True, show_progress=False
        )


def test_reorder_and_top_k(model):
    result = model.process(
        "q",
        [CONTEXT, "Doc two text.", "Doc three text."],
        reorder=True,
        top_k=2,
        threshold=0.0,
        show_progress=False,
    )
    scores = result["reranking_score"]
    assert len(scores) == 2
    assert scores == sorted(scores, reverse=True)


def test_default_threshold_from_config():
    model = _tiny_model(default_threadshold=1.0)
    # config threshold 1.0 → prunes everything when no arg given.
    result = model.process("q", CONTEXT, show_progress=False)
    assert result["pruned_context"] == ""
    # explicit arg overrides config
    result = model.process("q", CONTEXT, threshold=0.0, show_progress=False)
    assert result["pruned_context"] == CONTEXT


def test_long_context_multiblock(model):
    # Context far exceeding max_length → multiple blocks; text survives
    # round-trip at threshold 0.
    long_context = " ".join(
        f"Sentence number {i} talks about topic {i}." for i in range(40)
    )
    result = model.process("q", long_context, threshold=0.0, show_progress=False)
    assert result["pruned_context"] == long_context
    assert result["compression_rate"] == 0.0


def test_manual_specials_tokenizer_end_to_end():
    model = _tiny_model(tokenizer=ModernBertLikeTokenizer())
    result = model.process("q", CONTEXT, threshold=0.0, show_progress=False)
    assert result["pruned_context"] == CONTEXT


def test_raw_predictions_and_thresholds(model):
    contexts = ["First chunk text. ", "Second chunk here."]
    raw = model.get_raw_predictions("query", contexts)
    assert raw.ranking_score is not None
    assert len(raw.context_ranges) == 2
    assert raw.pruning_probs.ndim == 1

    result = model.predict_with_thresholds("query", contexts, [0.0, 1.0])
    assert result["predictions"][0.0] == [1, 1]
    assert result["predictions"][1.0] == [0, 0]


def test_pre_split_sentences_skip_splitter(model):
    sentences = ["Alpha one. ", "Beta two. ", "Gamma three."]
    result = model.process(
        "q", [sentences], threshold=0.0, show_progress=False,
        return_sentence_texts=True,
    )
    assert result["pruned_context"] == [["".join(sentences)][0]] or result[
        "pruned_context"
    ] == ["".join(sentences)]
    assert result["kept_sentences"][0] == sentences


def test_small_batch_size_pipelined_dispatch(model):
    """batch_size below the dispatcher's first-flush floor (8) must not
    dispatch chunks larger than the padded batch (pad_block_batch silently
    truncates extra rows). Many cells + a tiny preprocess chunk force the
    pipelined early-flush path."""
    contexts = [
        f"Sentence {i} about sushi and topic {i}. Second thought on {i}."
        for i in range(12)
    ]
    expected = model.process(
        "q", contexts, threshold=0.0, show_progress=False, batch_size=32
    )
    small = model.process(
        "q",
        contexts,
        threshold=0.0,
        show_progress=False,
        batch_size=3,
        preprocess_batch_size=2,  # >1 prep slice → pipelining active
    )
    assert small["pruned_context"] == expected["pruned_context"]
    np.testing.assert_allclose(
        small["reranking_score"], expected["reranking_score"], atol=1e-5
    )


def test_debug_messages_and_warning_gates(model, caplog):
    """debug_messages=callable receives the timing line; enable_warnings
    gates the engine's logging-module warnings (reference
    standalone:3427-3439 semantics for both hooks)."""
    import logging

    lines = []
    model.process(
        "q", CONTEXT, show_progress=False, debug_messages=lines.append
    )
    assert any("timing" in ln.lower() or "preprocess" in ln.lower() for ln in lines), lines

    with pytest.raises(TypeError):
        model.process("q", CONTEXT, show_progress=False, debug_messages=3)

    # torch_dataloader_kwargs is accepted-but-unused; the note is warned
    # unless enable_warnings=False.
    with caplog.at_level(logging.WARNING, logger="open_provence_tpu.inference.engine"):
        model.process(
            "q", CONTEXT, show_progress=False,
            torch_dataloader_kwargs={"num_workers": 2},
        )
    assert any("torch_dataloader_kwargs" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="open_provence_tpu.inference.engine"):
        model.process(
            "q", CONTEXT, show_progress=False,
            torch_dataloader_kwargs={"num_workers": 2}, enable_warnings=False,
        )
    assert not caplog.records


@pytest.mark.slow
def test_warmup_precompiles_bucket_programs(model):
    """warmup() must populate the jit caches for the shapes process()
    dispatches, so a following call adds no new compilations."""
    model._jit_cache.clear()
    model._jit_pool_cache.clear()
    warmed = model.warmup(batch_size=4)
    assert warmed
    assert set(model._jit_cache) == {(4, L) for L in (16, 32, 48, 64)}
    keys_before = set(model._jit_cache) | set(model._jit_pool_cache)
    model.process("q", [CONTEXT] * 6, batch_size=4, show_progress=False)
    keys_after = set(model._jit_cache) | set(model._jit_pool_cache)
    # Some partial-chunk row counts may still compile lazily; the full-batch
    # bucket programs must all have been covered by warmup.
    assert {k for k in keys_after - keys_before if k[0] == 4} == set()
