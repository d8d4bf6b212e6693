"""process() across tokenizer-edge variants: whitespace-only decodes
(empty-fragment fallback) and XLM-R double-SEP boundaries — mirroring the
reference's WhitespaceTokenizer/DoubleSepTokenizer fixtures."""

import pytest

from tests.dummy_tokenizers import DoubleSepTokenizer, WhitespaceTokenizer
from tests.test_process_engine import _tiny_model


def test_double_sep_block_inputs_and_process():
    from open_provence_tpu.text import FragmentRecord, TokenizerAdapter

    adapter = TokenizerAdapter(DoubleSepTokenizer())
    assert not adapter.manual_special_tokens
    query = adapter.encode("qq", add_special_tokens=False)
    frag = FragmentRecord("ab", 0, 0, 0, 2, adapter.encode("ab", add_special_tokens=False))
    input_ids, _, type_ids, ranges = adapter.prepare_block_inputs(query, [frag])
    # <s> q q </s></s> a b </s>
    assert input_ids == [1, 123, 123, 2, 2, 107, 108, 2]
    (start, end), = ranges
    assert input_ids[start:end] == frag.token_ids
    assert len(type_ids) == len(input_ids)

    model = _tiny_model(tokenizer=DoubleSepTokenizer())
    result = model.process("qq", "abc def. ghi.", threshold=0.0, show_progress=False)
    assert result["pruned_context"] == "abc def. ghi."


def test_whitespace_tokenizer_fallback_paths():
    """strip_sentences=True + blank decodes → the engine must fall back to
    the first decoded fragment instead of producing zero fragments
    (reference standalone:827-841)."""
    model = _tiny_model(tokenizer=WhitespaceTokenizer())
    result = model.process(
        "qq", "abc def.", threshold=0.0, show_progress=False, strip_sentences=True
    )
    # With blank decodes and strip_sentences, pruned text is whitespace-ish
    # or empty, but the call must not crash and must return the payload.
    assert "pruned_context" in result
    assert isinstance(result["compression_rate"], float)

    result = model.process("qq", "abc def.", threshold=0.0, show_progress=False)
    assert "pruned_context" in result


def test_config_threshold_typo_shim():
    """default_threadshold is canonical; default_threshold warns
    (reference standalone:1264-1302, tests :198-210)."""
    from open_provence_tpu.configs import OpenProvenceConfig

    config = OpenProvenceConfig.from_dict(
        {"model_type": "open_provence", "default_threadshold": 0.25,
         "base_model_config": {"model_type": "modernbert"}}
    )
    assert config.default_threadshold == 0.25
    assert config.default_threshold == 0.25
    assert config.resolve_threshold() == 0.25
    assert config.resolve_threshold(0.7) == 0.7

    with pytest.warns(RuntimeWarning, match="threadshold"):
        config = OpenProvenceConfig.from_dict(
            {"model_type": "open_provence", "default_threshold": 0.3,
             "base_model_config": {"model_type": "modernbert"}}
        )
    assert config.default_threadshold == 0.3

    with pytest.raises(TypeError):
        OpenProvenceConfig.from_dict(
            {"model_type": "open_provence", "default_threadshold": "not-a-number"}
        )

    # Round-trips through to_dict with the legacy spelling preserved.
    payload = config.to_dict()
    assert payload["default_threadshold"] == 0.3
    assert "default_threshold" not in payload
