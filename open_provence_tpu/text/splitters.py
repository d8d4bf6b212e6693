"""Language-routed sentence splitting (host-side, device-free).

Reimplements the reference's splitter stack
(modeling_open_provence_standalone.py:135-155, 1002-1143):

* ``is_japanese_fast`` — kana-density detector,
* ``simple_sentence_splitter`` — regex Japanese splitter (。！？!?\\n ends),
* English splitter — bullet-aware block iteration + Punkt span_tokenize with
  whitespace-preserving spans and deterministic max-chars clipping; when NLTK
  punkt data is unavailable (offline environments) a regex splitter with the
  same whitespace-preserving contract is used,
* ``create_auto_sentence_splitter`` — kana detection routes ja vs en.

The reference additionally supports fast-bunkai for Japanese; that library is
Rust and not available here, so Japanese routing uses the regex splitter,
which the reference itself ships as the documented fallback
(standalone:1018-1029).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Iterable

SentenceSplitter = Callable[[str], list[str]]

DEFAULT_ENGLISH_SENTENCE_MAX_CHARS = 1200

_BULLET_PREFIX_RE = re.compile(
    r"""^\s*(?:[\-\*••]+|\d{1,4}[:.)]|[A-Za-z]{1}[:.)])\s+""",
    re.UNICODE,
)

SUPPORTED_SPLITTER_LANGUAGES = {"ja", "en", "auto"}


def _is_kana_letter_cp(cp: int) -> bool:
    if 0x3041 <= cp <= 0x3096:  # Hiragana letters
        return True
    if 0x30A1 <= cp <= 0x30FA:  # Katakana letters
        return True
    if 0x31F0 <= cp <= 0x31FF:  # Katakana phonetic extensions
        return True
    if 0xFF71 <= cp <= 0xFF9D:  # Half-width katakana letters
        return True
    return False


def is_japanese_fast(text: str, window: int = 500, min_kana_per_window: int = 1) -> bool:
    """Classify text as Japanese when kana density exceeds the threshold
    (reference standalone:135-155)."""
    if not text:
        return False
    if text.isascii():
        return False
    required = math.ceil(len(text) / window) * min_kana_per_window
    if required <= 0:
        return False
    count = 0
    for ch in text:
        cp = ord(ch)
        if cp > 0x7F and _is_kana_letter_cp(cp):
            count += 1
            if count >= required:
                return True
    return False


def simple_sentence_splitter(text: str) -> list[str]:
    """Regex Japanese splitter (standalone:1018-1029)."""
    if not text:
        return []
    pattern = re.compile(r".+?(?:。|！|？|!|\?|\n|$)", re.S)
    sentences = [match for match in pattern.findall(text) if match]
    if sentences:
        return sentences
    return [text] if text else []


def japanese_sentence_splitter(text: str) -> list[str]:
    """Default Japanese splitter. The reference prefers fast-bunkai (Rust)
    with this regex splitter as the documented fallback."""
    return simple_sentence_splitter(text)


def _looks_like_bullet_line(line: str) -> bool:
    return bool(_BULLET_PREFIX_RE.match(line))


def _iter_english_blocks(text: str) -> Iterable[tuple[str, int, int]]:
    """Yield (block_text, start, end) groups of adjacent lines, breaking at
    bullet-style headings (standalone:485-529)."""
    if not text:
        return
    total_len = len(text)
    lines = text.splitlines(keepends=True)
    if not lines:
        if text:
            yield text, 0, total_len
        return

    accumulated = 0
    current_parts: list[str] = []
    current_start = 0
    for line in lines:
        line_start = accumulated
        accumulated += len(line)
        plain_line = line.rstrip("\r\n")
        if _looks_like_bullet_line(plain_line) and current_parts:
            block_text = "".join(current_parts)
            if block_text:
                yield block_text, current_start, current_start + len(block_text)
            current_parts = [line]
            current_start = line_start
        else:
            if not current_parts:
                current_start = line_start
            current_parts.append(line)
    if current_parts:
        block_text = "".join(current_parts)
        if block_text:
            yield block_text, current_start, current_start + len(block_text)
    if accumulated < total_len:
        remainder = text[accumulated:]
        if remainder:
            yield remainder, accumulated, total_len


def split_overlong_sentence(
    sentence: str,
    max_chars: int = DEFAULT_ENGLISH_SENTENCE_MAX_CHARS,
    *,
    preserve_whitespace: bool = False,
) -> list[str]:
    """Clip a sentence to ≤max_chars chunks, preferring newline then
    punctuation boundaries (standalone:532-579)."""
    working = sentence if preserve_whitespace else sentence.strip()
    if not working:
        return []
    if len(working) <= max_chars:
        return [working if preserve_whitespace else working.strip()]

    chunks: list[str] = []
    start = 0
    length = len(working)
    punctuation = ".?!;:\n"
    while start < length:
        target = min(start + max_chars, length)
        newline_idx = working.rfind("\n", start + 1, target)
        boundary: int | None = None
        if newline_idx != -1 and newline_idx >= start + 1:
            boundary = newline_idx + 1
        if boundary is None or boundary <= start:
            for idx in range(target, start, -1):
                if working[idx - 1] in punctuation:
                    boundary = idx
                    break
        if boundary is None or boundary <= start:
            boundary = target
        chunk = working[start:boundary]
        if not preserve_whitespace:
            chunk = chunk.strip()
        if chunk:
            chunks.append(chunk)
        start = boundary
    return chunks or ([working] if preserve_whitespace else [working.strip()])


# --- English sentence span tokenization -----------------------------------

_PUNKT_TOKENIZER = None
_PUNKT_CHECKED = False

_ABBREVIATIONS = {
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "etc", "vs", "e.g",
    "i.e", "fig", "no", "vol", "inc", "ltd", "co", "corp", "dept", "univ",
    "approx", "est", "min", "max", "u.s", "u.k", "a.m", "p.m",
}

_REGEX_SENT_END = re.compile(r"[.!?]+[\"')\]]*")


def _get_punkt():
    """Load NLTK punkt if its data is present; never raises, never downloads."""
    global _PUNKT_TOKENIZER, _PUNKT_CHECKED
    if _PUNKT_CHECKED:
        return _PUNKT_TOKENIZER
    _PUNKT_CHECKED = True
    try:
        import nltk

        _PUNKT_TOKENIZER = nltk.data.load("tokenizers/punkt/english.pickle")
    except Exception:
        _PUNKT_TOKENIZER = None
    return _PUNKT_TOKENIZER


def _regex_span_tokenize(text: str) -> list[tuple[int, int]]:
    """Punkt-like span tokenizer for offline environments: sentence ends at
    .!? runs not preceded by a known abbreviation/initial/number. Like punkt,
    spans exclude surrounding whitespace."""

    def _trimmed(start: int, end: int) -> tuple[int, int] | None:
        while start < end and text[start].isspace():
            start += 1
        while end > start and text[end - 1].isspace():
            end -= 1
        if start >= end:
            return None
        return start, end

    spans: list[tuple[int, int]] = []
    start = 0
    for match in _REGEX_SENT_END.finditer(text):
        end = match.end()
        # Candidate word before the punctuation.
        before = text[max(0, match.start() - 12) : match.start()]
        word_match = re.search(r"([A-Za-z][A-Za-z.]*)$", before)
        word = word_match.group(1).lower().rstrip(".") if word_match else ""
        if "." in match.group() and len(match.group().rstrip("\"')]")) == 1:
            if word in _ABBREVIATIONS or (len(word) == 1 and word.isalpha()):
                continue
            # Numeric like "3.14" — next char is a digit.
            if end < len(text) and text[end].isdigit():
                continue
        # Require whitespace-or-EOF after to end a sentence.
        if end < len(text) and not text[end].isspace():
            continue
        span = _trimmed(start, end)
        if span is not None:
            spans.append(span)
        start = end
    span = _trimmed(start, len(text))
    if span is not None:
        spans.append(span)
    return spans


def _span_tokenize(block_text: str) -> list[tuple[int, int]]:
    punkt = _get_punkt()
    if punkt is not None:
        return list(punkt.span_tokenize(block_text))
    return _regex_span_tokenize(block_text)


def create_english_sentence_splitter(
    max_chars: int = DEFAULT_ENGLISH_SENTENCE_MAX_CHARS,
) -> SentenceSplitter:
    """Whitespace-preserving English splitter (standalone:1032-1117):
    block iteration → span tokenization → trailing-whitespace extension →
    overlong clipping."""
    if max_chars <= 0:
        raise ValueError("max_chars must be positive")

    def _split_text(text: str) -> list[str]:
        if not text:
            return []
        sentences: list[str] = []
        for block_text, block_start, block_end in _iter_english_blocks(text):
            if not block_text:
                continue
            spans = _span_tokenize(block_text)
            if not spans:
                segment = text[block_start:block_end]
                if segment.strip():
                    sentences.extend(
                        split_overlong_sentence(
                            segment, max_chars=max_chars, preserve_whitespace=True
                        )
                    )
                continue
            for span_start, span_end in spans:
                global_start = block_start + span_start
                global_end = block_start + span_end
                extended_end = global_end
                while extended_end < block_end and text[extended_end].isspace():
                    extended_end += 1
                segment = text[global_start:extended_end]
                if segment and segment.strip():
                    sentences.extend(
                        split_overlong_sentence(
                            segment, max_chars=max_chars, preserve_whitespace=True
                        )
                    )
        if sentences:
            return sentences
        fallback = text.strip()
        return [fallback] if fallback else []

    return _split_text


_DEFAULT_ENGLISH_SENTENCE_SPLITTER = create_english_sentence_splitter()


def english_sentence_splitter(text: str) -> list[str]:
    return _DEFAULT_ENGLISH_SENTENCE_SPLITTER(text)


def create_auto_sentence_splitter(
    *,
    japanese_splitter: SentenceSplitter = japanese_sentence_splitter,
    english_splitter: SentenceSplitter = english_sentence_splitter,
    kana_window: int = 500,
    min_kana_per_window: int = 1,
) -> SentenceSplitter:
    def _split_text(text: str) -> list[str]:
        if is_japanese_fast(text, window=kana_window, min_kana_per_window=min_kana_per_window):
            return japanese_splitter(text)
        return english_splitter(text)

    return _split_text


def resolve_sentence_splitter(
    splitter: SentenceSplitter | dict | None, language: str | None
) -> SentenceSplitter:
    """Mirror of the reference's splitter resolution
    (standalone:2007-2039)."""
    if isinstance(splitter, dict):
        if language is None:
            raise ValueError("language must be provided when sentence_splitter is a mapping")
        if language in splitter:
            return splitter[language]
        raise ValueError(f"No sentence splitter registered for language '{language}'")
    if callable(splitter):
        return splitter
    lang = (language or "auto").lower()
    if lang == "auto":
        return create_auto_sentence_splitter()
    if lang == "ja":
        return japanese_sentence_splitter
    if lang == "en":
        return english_sentence_splitter
    raise ValueError(
        f"Unsupported language code for sentence splitting: '{lang}'. "
        "Supported values are 'auto', 'en', and 'ja'."
    )
