"""Native host ops: build/load, and randomized parity between the C++
implementations and the Python fallbacks."""

import numpy as np

from open_provence_tpu import native


def _python_find_subsequence(haystack, needle):
    if not needle:
        return -1
    n, m = len(haystack), len(needle)
    for i in range(n - m + 1):
        if list(haystack[i : i + m]) == list(needle):
            return i
    return -1


def _python_greedy_pack(lens, base_len, available_len):
    capacity = max(1, available_len - base_len)
    block_ids, new_lens = [], []
    block, current_len, block_open = 0, base_len, False
    for length in lens:
        if current_len + length <= available_len:
            block_ids.append(block)
            new_lens.append(length)
            current_len += length
            block_open = True
            continue
        if block_open:
            block += 1
            block_open = False
            current_len = base_len
        truncated = min(length, capacity)
        block_ids.append(block)
        new_lens.append(truncated)
        current_len = base_len + truncated
        block_open = True
    return block_ids, new_lens, block + 1


def test_native_library_builds():
    # g++ is in the image; the library must build and load.
    assert native.is_available()


def test_find_subsequence_parity_randomized():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 40))
        m = int(rng.integers(0, 6))
        hay = rng.integers(0, 5, size=n).tolist()
        if m and n >= m and rng.random() < 0.5:
            start = int(rng.integers(0, n - m + 1))
            needle = hay[start : start + m]
        else:
            needle = rng.integers(0, 5, size=m).tolist()
        assert native.find_subsequence(hay, needle) == _python_find_subsequence(hay, needle)


def test_find_subsequence_edges():
    assert native.find_subsequence([1, 2, 3], []) == -1
    assert native.find_subsequence([], [1]) == -1
    assert native.find_subsequence([1, 2, 3], [1, 2, 3]) == 0
    assert native.find_subsequence([1, 2, 3], [2, 3]) == 1
    assert native.find_subsequence([1, 2], [1, 2, 3]) == -1


def test_greedy_pack_parity_randomized():
    rng = np.random.default_rng(1)
    for trial in range(200):
        # Cover both the small-n plain-list path (<=64) and the native one.
        n = int(rng.integers(0, 20 if trial % 2 else 200))
        lens = rng.integers(1, 30, size=n).tolist()
        base = int(rng.integers(0, 10))
        available = int(rng.integers(base + 1, base + 40))
        got_ids, got_lens, got_blocks = native.greedy_pack(lens, base, available)
        exp_ids, exp_lens, exp_blocks = _python_greedy_pack(lens, base, available)
        if n == 0:
            assert got_blocks == 0
            continue
        assert np.asarray(got_ids).tolist() == exp_ids
        assert np.asarray(got_lens).tolist() == exp_lens
        assert got_blocks == exp_blocks


def test_greedy_pack_matches_reference_assemble():
    """The plan must reproduce assemble_blocks grouping for packed text."""
    from tests.dummy_tokenizers import DummyTokenizer
    from open_provence_tpu.text import FragmentRecord, assemble_blocks

    tok = DummyTokenizer()
    rng = np.random.default_rng(2)
    fragments = []
    for i in range(15):
        n = int(rng.integers(1, 12))
        tokens = [ord("a") + 10 + int(x) for x in rng.integers(0, 20, size=n)]
        fragments.append(
            FragmentRecord("x" * n, i, 0, i, n, tokens)
        )
    blocks = assemble_blocks(tok, 20, 4, 0, fragments)
    # Invariants: every block fits, order preserved, all fragments present.
    flat = [f.global_index for b in blocks for f in b]
    assert flat == sorted(flat)
    assert len(flat) == len(fragments)
    for block in blocks:
        assert 4 + sum(f.token_length for f in block) <= 18


def test_pad_block_batch_parity():
    rows = [[1, 2, 3], [], [4] * 10]
    ids, attn = native.pad_block_batch_i32(rows, seq_len=5, batch_size=4, pad_id=9)
    assert ids.shape == (4, 5)
    assert ids[0].tolist() == [1, 2, 3, 9, 9]
    assert attn[0].tolist() == [1, 1, 1, 0, 0]
    assert ids[1].tolist() == [9] * 5
    assert ids[2].tolist() == [4] * 5  # truncated to seq_len
    assert attn[2].tolist() == [1] * 5
    assert ids[3].tolist() == [9] * 5 and attn[3].sum() == 0


def test_en_split_spans_fuzz_parity():
    """Native English splitter == pure-Python splitter on randomized ASCII
    soup covering abbreviations, bullets, quotes, numerics, line
    terminators, and overlong clipping."""
    import random

    import pytest

    from open_provence_tpu.text.splitters import _EnglishSplitter

    if not native.is_available():
        pytest.skip("native host ops unavailable")

    rng = random.Random(7)
    words = ["hello", "world", "dr", "mr", "e.g", "fig", "approx", "the",
             "a", "B", "No", "vol", "3.14", "12", "U.S", "item", "x",
             "inc.", "Mr."]
    punct = [". ", "! ", "? ", "... ", ".\n", "!? ", ".) ", '."', ".' ",
             ". )", " .", ".5 ", ".x ", ".\r\n", '.")', "?!\"')] "]
    bullets = ["- ", "* ", "1) ", "23. ", "a) ", "B. ", "1234: ",
               "12345. ", "-- ", "-x ", "\t- ", " * y "]
    ws = [" ", "  ", "\n", "\n\n", "\t", "\r\n", "\v", "\x1c", "", "\x1f", "\f"]
    pools = (words, punct, ws, bullets)
    pairs = [
        (_EnglishSplitter(m, use_native=False), _EnglishSplitter(m, use_native=True))
        for m in (1200, 50)
    ]
    for _ in range(2500):
        parts = [rng.choice(rng.choice(pools)) for _ in range(rng.randrange(0, 30))]
        text = "".join(parts)
        for py, nat in pairs:
            assert py(text) == nat(text), repr(text)


def test_en_split_spans_non_ascii_falls_back():
    from open_provence_tpu.text.splitters import _EnglishSplitter

    assert native.en_split_spans("café. done.", 1200) is None
    # The splitter itself still handles non-ASCII via the Python route.
    sp = _EnglishSplitter(1200, use_native=True)
    assert sp("café one. two.") == _EnglishSplitter(1200, use_native=False)(
        "café one. two."
    )


def test_en_split_spans_thread_safety():
    """en_split_spans runs concurrently in the engine's preprocess worker
    threads; the C call releases the GIL, so each thread must see its own
    output buffer (a shared buffer corrupts spans silently)."""
    import pytest
    from concurrent.futures import ThreadPoolExecutor

    if not native.is_available():
        pytest.skip("native host ops unavailable")

    texts = [
        " ".join(f"sentence {i} chunk {j} runs here." for j in range(40))
        for i in range(16)
    ]
    expected = [native.en_split_spans(t, 1200) for t in texts]

    def many(idx):
        t = texts[idx]
        for _ in range(50):
            if native.en_split_spans(t, 1200) != expected[idx]:
                return False
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        assert all(pool.map(many, list(range(16)) * 4))
