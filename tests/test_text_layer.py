"""Unit + golden tests for the host text layer (splitters, fragmentation,
block packing, tokenizer adapter).

Golden tests compare against the reference's pure functions when
/root/reference is mounted (it is deterministic, dependency-light Python);
unit tests assert documented behavior independently.
"""

import sys
from pathlib import Path

import pytest

from open_provence_tpu.text import (
    TokenizerAdapter,
    assemble_blocks,
    fragmentize_job,
    fragments_from_payload,
    is_japanese_fast,
    max_fragment_tokens_for,
    normalize_sentences,
    simple_sentence_splitter,
    split_overlong_sentence,
    split_token_lists,
)
from open_provence_tpu.text.splitters import (
    create_english_sentence_splitter,
    create_auto_sentence_splitter,
    resolve_sentence_splitter,
)

from tests.dummy_tokenizers import DummyTokenizer, ModernBertLikeTokenizer

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = (REFERENCE_ROOT / "open_provence").exists()


def _load_reference_standalone():
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import open_provence.modeling_open_provence_standalone as ref

    return ref


# --- is_japanese_fast -------------------------------------------------------


def test_is_japanese_fast_basics():
    assert not is_japanese_fast("")
    assert not is_japanese_fast("hello world this is english")
    assert is_japanese_fast("これは日本語の文章です。")
    # Kanji-only text without kana is not detected (kana-density heuristic).
    assert not is_japanese_fast("漢字漢字漢字")


def test_simple_sentence_splitter():
    text = "今日は晴れです。明日は雨かな？はい！"
    assert simple_sentence_splitter(text) == ["今日は晴れです。", "明日は雨かな？", "はい！"]
    assert simple_sentence_splitter("") == []
    assert simple_sentence_splitter("句読点なし") == ["句読点なし"]


def test_split_overlong_sentence():
    text = "a" * 50 + ". " + "b" * 50
    chunks = split_overlong_sentence(text, max_chars=60, preserve_whitespace=True)
    assert "".join(chunks) == text
    assert all(len(c) <= 60 for c in chunks)
    assert split_overlong_sentence("   ", max_chars=10) == []


def test_english_splitter_preserves_text():
    splitter = create_english_sentence_splitter()
    text = (
        "Work deadlines piled up today, and I kept rambling.\n"
        "Next spring I'm planning a trip to Japan. Sushi is my favourite!\n"
        "- bullet item one\n"
        "- bullet item two\n"
    )
    sentences = splitter(text)
    assert len(sentences) >= 3
    # Whitespace-preserving contract: concatenation reproduces the source
    # text (modulo leading whitespace that precedes the first sentence).
    joined = "".join(sentences)
    assert joined.strip() == text.strip()


def test_auto_splitter_routing():
    auto = create_auto_sentence_splitter()
    ja = auto("これは日本語です。二文目です。")
    assert ja == ["これは日本語です。", "二文目です。"]
    en = auto("This is English. Second sentence.")
    assert len(en) == 2


def test_resolve_sentence_splitter_contract():
    assert resolve_sentence_splitter(None, "ja") is not None
    with pytest.raises(ValueError):
        resolve_sentence_splitter(None, "de")
    mapping = {"en": lambda t: [t]}
    assert resolve_sentence_splitter(mapping, "en")("x") == ["x"]
    with pytest.raises(ValueError):
        resolve_sentence_splitter(mapping, None)
    with pytest.raises(ValueError):
        resolve_sentence_splitter(mapping, "ja")


# --- fragmentation ----------------------------------------------------------


def test_split_token_lists_stride():
    token_lists = [[1, 2, 3, 4, 5], [], [6, 7]]
    frags = split_token_lists(token_lists, 2)
    assert frags == [
        ([1, 2], 0, 0, 0),
        ([3, 4], 0, 1, 1),
        ([5], 0, 2, 2),
        ([6, 7], 2, 0, 3),
    ]


def test_split_token_lists_keep_boundaries():
    token_lists = [[1, 2, 3], [4, 5, 6, 7, 8]]
    frags = split_token_lists(token_lists, 4, keep_sentence_boundaries=True)
    # First sentence fits → kept whole; second is split at stride 4.
    assert frags[0] == ([1, 2, 3], 0, 0, 0)
    assert frags[1] == ([4, 5, 6, 7], 1, 0, 1)
    assert frags[2] == ([8], 1, 1, 2)


def test_max_fragment_tokens_for():
    assert max_fragment_tokens_for(512, False) == 256
    assert max_fragment_tokens_for(512, True) == 510
    assert max_fragment_tokens_for(20, False) == 16


def test_normalize_sentences_fallback():
    assert normalize_sentences([], "fallback text", False) == ["fallback text"]
    assert normalize_sentences(["", ""], "ctx", True) == ["ctx"]


def test_fragmentize_job_roundtrip():
    tok = DummyTokenizer()
    job = {"context_text": "abcdef. ghij.", "prefix_sentences": []}
    entry = fragmentize_job(
        tok,
        job,
        max_fragment_tokens=4,
        splitter=lambda t: ["abcdef. ", "ghij."],
        strip_sentences=False,
        respect_sentence_boundaries=False,
    )
    # Char tokenizer: every char one token; fragments of ≤4 chars.
    assert "".join(entry["fragment_texts"]) == "abcdef. ghij."
    assert entry["sentences"] == ["abcdef. ", "ghij."]
    assert all(len(ids) <= 4 for ids in entry["fragment_token_ids"])


def test_fragmentize_prefix_token_counts_use_normalized_text():
    """Prefix token counts must be measured on the NORMALIZED prefix
    sentences (reference standalone:2486-2489 counts cached_token_lists
    entries), not the raw prefix strings — under strip_sentences the final
    prefix loses its newline terminator, which changes its token count on a
    char/BPE tokenizer."""
    tok = DummyTokenizer()
    job = {
        "context_text": "abcd. efgh.",
        "prefix_sentences": ["Doc Title\n"],  # resolve_prefix_sentences form
    }
    entry = fragmentize_job(
        tok,
        job,
        max_fragment_tokens=8,
        splitter=lambda t: ["abcd. ", "efgh."],
        strip_sentences=True,
        respect_sentence_boundaries=False,
    )
    # Char tokenizer: "Doc Title" (stripped) = 9 tokens; raw "Doc Title\n"
    # would be 10.
    assert entry["prefix_token_counts"] == [9]
    assert entry["sentences"][0] == "Doc Title"

    # Unstripped mode keeps the newline: count measured on "Doc Title\n".
    entry_keep = fragmentize_job(
        tok,
        job,
        max_fragment_tokens=8,
        splitter=lambda t: ["abcd. ", "efgh."],
        strip_sentences=False,
        respect_sentence_boundaries=False,
    )
    assert entry_keep["prefix_token_counts"] == [10]

    # No prefixes → empty counts.
    plain = fragmentize_job(
        tok,
        {"context_text": "abcd.", "prefix_sentences": []},
        max_fragment_tokens=8,
        splitter=lambda t: ["abcd."],
        strip_sentences=False,
        respect_sentence_boundaries=False,
    )
    assert plain["prefix_token_counts"] == []


def test_encode_batch_ids_matches_hf_call(tmp_path):
    """The Rust-direct encode fast path must produce the ids the HF wrapper
    returns, and fall back cleanly when truncation state is active or the
    tokenizer has no fast backend."""
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from make_toy_assets import build_tokenizer

    hf_tok, _ = build_tokenizer(tmp_path)
    adapter = TokenizerAdapter(hf_tok)
    texts = ["sushi ramen kyoto", "a", "", "market travel budget deadline"]
    via_hf = hf_tok(texts, add_special_tokens=False, return_attention_mask=False)[
        "input_ids"
    ]
    assert adapter.encode_batch_ids(texts) == [list(r) for r in via_hf]

    # Sticky-truncation guard: with backend truncation enabled the fast path
    # must defer to HF (which resets state per call).
    backend = hf_tok._tokenizer
    backend.enable_truncation(max_length=2)
    try:
        assert adapter.encode_batch_ids(texts) == [
            list(r)
            for r in hf_tok(texts, add_special_tokens=False, return_attention_mask=False)[
                "input_ids"
            ]
        ]
    finally:
        backend.no_truncation()

    # Slow tokenizer (no backend): fallback path.
    slow = TokenizerAdapter(DummyTokenizer())
    assert slow.encode_batch_ids(["ab"]) == [
        list(DummyTokenizer()(["ab"], add_special_tokens=False)["input_ids"][0])
    ]


def test_fragmentize_jobs_matches_per_job_results():
    """The chunk-batched path must be observably identical per job to the
    single-job path (timing keys excluded), including the empty-context and
    cached-token short-circuit cases."""
    from open_provence_tpu.text.fragmentation import fragmentize_jobs

    tok = DummyTokenizer()
    splitter = lambda t: [s + " " for s in t.split() if s] or [t]  # noqa: E731
    jobs = [
        {"context_text": "abcdef. ghij.", "prefix_sentences": []},
        {"context_text": "", "prefix_sentences": []},  # fallback: whole context
        {
            "context_text": "xy",
            "prefix_sentences": [],
            "cached_sentences": ["xy"],
            "cached_token_lists": [[120, 121]],
        },
        {"context_text": "klm nop qrstuv wx", "prefix_sentences": []},
    ]
    kwargs = dict(
        max_fragment_tokens=4,
        splitter=splitter,
        strip_sentences=False,
        respect_sentence_boundaries=False,
    )
    batched = fragmentize_jobs(tok, jobs, **kwargs)
    singles = [fragmentize_job(tok, job, **kwargs) for job in jobs]

    def strip_timing(entry):
        return {k: v for k, v in entry.items() if not k.startswith("timing_")}

    assert [strip_timing(e) for e in batched] == [strip_timing(e) for e in singles]
    # Timing keys still present and summable.
    assert all(k in batched[0] for k in (
        "timing_tokenize", "timing_fragment_decode", "timing_fragment_split"))


def test_assemble_blocks_packing_and_truncation():
    tok = DummyTokenizer()
    job = {"context_text": "x" * 40, "prefix_sentences": []}
    entry = fragmentize_job(
        tok,
        job,
        max_fragment_tokens=8,
        splitter=lambda t: [t],
        strip_sentences=False,
        respect_sentence_boundaries=False,
    )
    fragments = fragments_from_payload(entry)
    # max_length 20: available=18, query 5 + sep 0 → capacity 13 per block.
    blocks = assemble_blocks(tok, 20, 5, 0, fragments)
    for block in blocks:
        total = sum(f.token_length for f in block)
        assert 5 + total <= 18
    # All fragment tokens survive packing (none dropped).
    packed = [t for block in blocks for f in block for t in f.token_ids]
    assert len(packed) == 40


def test_assemble_blocks_oversize_fragment_truncated():
    tok = DummyTokenizer()
    frag_tokens = [ord("y") + 10] * 30
    from open_provence_tpu.text import FragmentRecord

    frag = FragmentRecord(
        text="y" * 30, sentence_index=0, fragment_index=0, global_index=0,
        token_length=30, token_ids=frag_tokens,
    )
    blocks = assemble_blocks(tok, 20, 4, 0, [frag])
    assert len(blocks) == 1
    assert blocks[0][0].token_length == 14  # 18 available − 4 query


# --- tokenizer adapter ------------------------------------------------------


def test_manual_specials_probe():
    assert not TokenizerAdapter(DummyTokenizer()).manual_special_tokens
    adapter = TokenizerAdapter(ModernBertLikeTokenizer())
    assert adapter.manual_special_tokens
    assert adapter.manual_cls_token_id == 1
    assert adapter.manual_sep_token_id == 2


def test_prepare_block_inputs_normal_tokenizer():
    adapter = TokenizerAdapter(DummyTokenizer())
    from open_provence_tpu.text import FragmentRecord

    query = adapter.encode("qq", add_special_tokens=False)
    frag = FragmentRecord("ab", 0, 0, 0, 2, adapter.encode("ab", add_special_tokens=False))
    input_ids, mask, type_ids, ranges = adapter.prepare_block_inputs(query, [frag])
    # [CLS] q q [SEP] a b [SEP]
    assert input_ids[0] == 1 and input_ids[3] == 2 and input_ids[-1] == 2
    assert len(mask) == len(input_ids) == len(type_ids)
    (start, end), = ranges
    assert input_ids[start:end] == frag.token_ids


def test_prepare_block_inputs_manual_specials():
    adapter = TokenizerAdapter(ModernBertLikeTokenizer())
    from open_provence_tpu.text import FragmentRecord

    query = adapter.encode("qq", add_special_tokens=False)
    frag = FragmentRecord("ab", 0, 0, 0, 2, adapter.encode("ab", add_special_tokens=False))
    input_ids, _, _, ranges = adapter.prepare_block_inputs(query, [frag])
    # Manual injection: [CLS] q q [SEP] a b [SEP]
    assert input_ids[0] == 1 and input_ids[3] == 2 and input_ids[-1] == 2
    (start, end), = ranges
    assert input_ids[start:end] == frag.token_ids


def test_prepare_block_inputs_rejects_stale_context_start_hint():
    """A memoized context-start offset is only a CANDIDATE: it must be
    re-verified against each block's ids so a degenerate first-match from one
    block (context run also present inside the query) cannot shift the
    fragment ranges of unrelated blocks."""
    adapter = TokenizerAdapter(DummyTokenizer())
    from open_provence_tpu.text import FragmentRecord

    query = adapter.encode("qq", add_special_tokens=False)
    frag = FragmentRecord("ab", 0, 0, 0, 2, adapter.encode("ab", add_special_tokens=False))
    # Correct layout: [CLS] q q [SEP] a b [SEP] → context starts at 4.
    _, _, _, good = adapter.prepare_block_inputs(query, [frag], context_start_hint=4)
    assert good[0] == (4, 6)
    # A hint pointing at the query region (wrong block's memo) does not
    # match this block's context tokens → full search recovers offset 4.
    for stale in (1, 2, 0, -3, 100):
        _, _, _, ranges = adapter.prepare_block_inputs(
            query, [frag], context_start_hint=stale
        )
        assert ranges == [(4, 6)], stale


# --- golden tests vs the reference's pure functions -------------------------


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_split_token_lists():
    ref = _load_reference_standalone()
    cases = [
        ([[1, 2, 3, 4, 5], [], [6, 7]], 2, False),
        ([[1, 2, 3], [4, 5, 6, 7, 8]], 4, True),
        ([[9] * 17], 5, False),
        ([], 3, False),
    ]
    for token_lists, max_frag, keep in cases:
        ours = split_token_lists(token_lists, max_frag, keep_sentence_boundaries=keep)
        theirs = ref._split_token_lists(
            token_lists, max_frag, keep_sentence_boundaries=keep
        )
        assert ours == theirs


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_is_japanese_fast():
    ref = _load_reference_standalone()
    cases = [
        "", "hello", "これは日本語です。", "漢字漢字漢字", "mixed 日本語 text です",
        "ｱｲｳｴｵ half width", "a" * 1000 + "ぁ",
    ]
    for text in cases:
        assert is_japanese_fast(text) == ref.is_japanese_fast(text), repr(text)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_simple_sentence_splitter():
    ref = _load_reference_standalone()
    cases = ["今日は晴れ。明日は雨？", "", "改行\nあり", "！？。", "no punct"]
    for text in cases:
        assert simple_sentence_splitter(text) == ref.simple_sentence_splitter(text)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_split_overlong_sentence():
    ref = _load_reference_standalone()
    cases = [
        ("short", 60, True),
        ("a" * 50 + ". " + "b" * 50, 60, True),
        ("line one\nline two\nline three " * 10, 40, True),
        ("nowhitespace" * 20, 50, False),
    ]
    for text, max_chars, preserve in cases:
        ours = split_overlong_sentence(text, max_chars=max_chars, preserve_whitespace=preserve)
        theirs = ref._split_overlong_sentence(
            text, max_chars=max_chars, preserve_whitespace=preserve
        )
        assert ours == theirs


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_normalize_sentences():
    ref = _load_reference_standalone()
    cases = [
        (["one\ntwo\nthree", "x."], "ctx", False),
        (["a. b.\nc"], "ctx", True),
        ([], "fallback", False),
        (["", ""], "ctx", True),
    ]
    for raw, ctx, strip in cases:
        assert normalize_sentences(raw, ctx, strip) == ref._normalize_sentences(raw, ctx, strip)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_english_blocks():
    ref = _load_reference_standalone()
    from open_provence_tpu.text.splitters import _iter_english_blocks

    cases = [
        "plain paragraph one.\nstill same block.\n- bullet one\n- bullet two\ntail",
        "",
        "1. numbered\n2. item\ntext after",
        "no newline at all",
    ]
    for text in cases:
        assert list(_iter_english_blocks(text)) == list(ref._iter_english_blocks(text))


def test_japanese_splitter_fallback_without_fast_bunkai(monkeypatch):
    """With fast-bunkai absent (the offline default here) the ja path must
    use the terminator-scan splitter (reference standalone:1018-1029)."""
    from open_provence_tpu.text import splitters

    monkeypatch.setattr(splitters, "_FAST_BUNKAI_PROBED", True)
    monkeypatch.setattr(splitters, "_FAST_BUNKAI_SPLITTER", None)
    text = "今日は晴れです。明日は雨かな？"
    assert splitters.japanese_sentence_splitter(text) == splitters.simple_sentence_splitter(text)


def test_japanese_splitter_uses_fast_bunkai_when_available(monkeypatch):
    """When the probe finds an engine, its output is used verbatim."""
    from open_provence_tpu.text import splitters

    monkeypatch.setattr(splitters, "_FAST_BUNKAI_PROBED", True)
    monkeypatch.setattr(
        splitters, "_FAST_BUNKAI_SPLITTER", lambda text: ["A。", "B。"]
    )
    assert splitters.japanese_sentence_splitter("A。B。") == ["A。", "B。"]


def test_japanese_splitter_real_fast_bunkai():
    pytest.importorskip("fast_bunkai")
    from open_provence_tpu.text import splitters

    pieces = splitters.japanese_sentence_splitter("今日は晴れです。明日は雨です。")
    assert "".join(pieces) == "今日は晴れです。明日は雨です。"


def test_fragmentize_filter_only_matches_full_decode():
    """decode_fragments='filter_only' must make the SAME keep/drop decisions
    as the full-decode path (texts blank), including whitespace-only decodes
    and the all-empty fallback, in both strip modes."""
    from open_provence_tpu.text.fragmentation import fragmentize_jobs
    from tests.dummy_tokenizers import WhitespaceTokenizer

    splitter = lambda t: [s + " " for s in t.split() if s] or [t]  # noqa: E731
    jobs = [
        {"context_text": "abcdef. ghij.", "prefix_sentences": []},
        {"context_text": "", "prefix_sentences": []},
        {"context_text": "klm nop qrstuv wx", "prefix_sentences": []},
    ]
    for tok_cls in (DummyTokenizer, WhitespaceTokenizer):
        for strip in (False, True):
            kwargs = dict(
                max_fragment_tokens=4,
                splitter=splitter,
                strip_sentences=strip,
                respect_sentence_boundaries=False,
            )
            full = fragmentize_jobs(tok_cls(), jobs, decode_fragments=True, **kwargs)
            fast = fragmentize_jobs(
                tok_cls(), jobs, decode_fragments="filter_only", **kwargs
            )
            for f_entry, q_entry in zip(full, fast):
                for key in (
                    "fragment_token_ids",
                    "fragment_sentence_index",
                    "fragment_fragment_index",
                    "fragment_global_index",
                    "sentences",
                    "prefix_token_counts",
                ):
                    assert f_entry[key] == q_entry[key], (tok_cls.__name__, strip, key)
                assert all(t == "" for t in q_entry["fragment_texts"])


def test_filter_only_classifier_cache_reused():
    from open_provence_tpu.text.fragmentation import (
        _classify_fragment_solidity,
        _solid_id_cache,
    )

    tok = DummyTokenizer()
    pieces = [[([ord("a") + 10, ord("b") + 10], 0, 0, 0)]]
    assert _classify_fragment_solidity(tok, pieces) == [[True]]
    solid, undecidable = _solid_id_cache(tok)
    assert ord("a") + 10 in solid  # clean char => solid
    # Second call resolves from the memo (no new ids classified).
    size = len(solid) + len(undecidable)
    assert _classify_fragment_solidity(tok, pieces) == [[True]]
    assert len(solid) + len(undecidable) == size
