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


def test_prepare_block_inputs_fast_flags():
    """The engine's per-block fast path (skip token_type_ids, reuse the
    context-start offset) must produce identical ids/mask/ranges to the
    default search path."""
    from open_provence_tpu.text import FragmentRecord, TokenizerAdapter

    adapter = TokenizerAdapter(DoubleSepTokenizer())
    query = adapter.encode("qq", add_special_tokens=False)
    frags = [
        FragmentRecord("ab", 0, 0, 0, 2, adapter.encode("ab", add_special_tokens=False)),
        FragmentRecord("cd", 1, 0, 1, 2, adapter.encode("cd", add_special_tokens=False)),
    ]
    ids_ref, mask_ref, type_ref, ranges_ref = adapter.prepare_block_inputs(query, frags)
    hint = ranges_ref[0][0]
    ids, mask, type_ids, ranges = adapter.prepare_block_inputs(
        query, frags, want_token_type_ids=False, context_start_hint=hint
    )
    assert ids == ids_ref
    assert mask == mask_ref
    assert ranges == ranges_ref
    assert type_ids is None
    assert type_ref is not None


def test_fragmentize_decode_opt_out():
    """decode_fragments=False skips fragment text (blank) but produces the
    same token ids, indices, and sentence lists as the decoding path."""
    from tests.dummy_tokenizers import DummyTokenizer
    from open_provence_tpu.text.fragmentation import fragmentize_jobs

    tok = DummyTokenizer()
    splitter = lambda t: [s + " " for s in t.split() if s] or [t]  # noqa: E731
    jobs = [
        {"context_text": "abcdef. ghij.", "prefix_sentences": []},
        {"context_text": "klm nop qrstuv wx", "prefix_sentences": []},
    ]
    kwargs = dict(
        max_fragment_tokens=4,
        splitter=splitter,
        strip_sentences=False,
        respect_sentence_boundaries=False,
    )
    decoded = fragmentize_jobs(tok, jobs, **kwargs)
    blank = fragmentize_jobs(tok, jobs, decode_fragments=False, **kwargs)
    for d, b in zip(decoded, blank):
        assert b["fragment_texts"] == [""] * len(d["fragment_texts"])
        for key in (
            "sentences",
            "fragment_token_ids",
            "fragment_sentence_index",
            "fragment_fragment_index",
            "fragment_global_index",
        ):
            assert b[key] == d[key], key


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
