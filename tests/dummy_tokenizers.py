"""Test tokenizer fixtures.

Char-ordinal tokenizers with CLS/SEP semantics, modeled on the reference's
DummyTokenizer family (tests/test_modeling_open_provence.py:40-140) so that
tokenizer-edge behaviors (manual specials, double-SEP boundaries, blank
decodes) are exercised without network access.
"""

from __future__ import annotations

from collections.abc import Sequence


class _Batch(dict):
    def __init__(self, input_ids):
        super().__init__(input_ids=input_ids)

    @property
    def input_ids(self):
        return self["input_ids"]


class DummyTokenizer:
    """Char-ordinal tokenizer: token id = ord(char) + 10. CLS=1, SEP=2, PAD=0."""

    cls_token_id = 1
    sep_token_id = 2
    pad_token_id = 0
    bos_token_id = None
    eos_token_id = None
    cls_token = "[CLS]"
    sep_token = "[SEP]"
    pad_token = "[PAD]"
    model_max_length = 1_000_000

    # When True, build_inputs_with_special_tokens drops specials for
    # pre-tokenized input, emulating ModernBERT's quirk.
    drops_specials = False

    @property
    def special_tokens_map(self):
        return {
            "cls_token": self.cls_token,
            "sep_token": self.sep_token,
            "pad_token": self.pad_token,
        }

    def _encode_text(self, text: str) -> list[int]:
        return [ord(ch) + 10 for ch in text]

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids = self._encode_text(text)
        if add_special_tokens:
            return [self.cls_token_id] + ids + [self.sep_token_id]
        return ids

    def __call__(
        self,
        texts,
        add_special_tokens: bool = True,
        return_attention_mask: bool = True,
        **kwargs,
    ):
        if isinstance(texts, str):
            texts = [texts]
        input_ids = [self.encode(t, add_special_tokens=add_special_tokens) for t in texts]
        return _Batch(input_ids)

    def decode(self, token_ids: Sequence[int], **kwargs) -> str:
        chars = []
        for tid in token_ids:
            tid = int(tid)
            if tid in (self.cls_token_id, self.sep_token_id, self.pad_token_id):
                continue
            chars.append(chr(tid - 10))
        return "".join(chars)

    def batch_decode(self, sequences, **kwargs):
        return [self.decode(seq, **kwargs) for seq in sequences]

    def build_inputs_with_special_tokens(self, ids0, ids1=None):
        if self.drops_specials:
            if ids1 is None:
                return list(ids0)
            return list(ids0) + list(ids1)
        if ids1 is None:
            return [self.cls_token_id] + list(ids0) + [self.sep_token_id]
        return (
            [self.cls_token_id]
            + list(ids0)
            + [self.sep_token_id]
            + list(ids1)
            + [self.sep_token_id]
        )

    def create_token_type_ids_from_sequences(self, ids0, ids1=None):
        if ids1 is None:
            return [0] * (len(ids0) + 2)
        return [0] * (len(ids0) + 2) + [1] * (len(ids1) + 1)

    def get_vocab(self):
        return {"[CLS]": 1, "[SEP]": 2, "[PAD]": 0}


class ModernBertLikeTokenizer(DummyTokenizer):
    """Drops specials on pre-tokenized input — exercises the manual-specials
    probe path (standalone:1501-1538)."""

    drops_specials = True


class WhitespaceTokenizer(DummyTokenizer):
    """decode() returns blanks — exercises the empty-fragment fallback paths
    (reference tests/test_modeling_open_provence.py WhitespaceTokenizer)."""

    def decode(self, token_ids, **kwargs):
        return " " * sum(
            1
            for t in token_ids
            if int(t) not in (self.cls_token_id, self.sep_token_id, self.pad_token_id)
        )


class DoubleSepTokenizer(DummyTokenizer):
    """XLM-R-style boundary: <s> a </s></s> b </s> (reference
    DoubleSepTokenizer)."""

    def build_inputs_with_special_tokens(self, ids0, ids1=None):
        if ids1 is None:
            return [self.cls_token_id] + list(ids0) + [self.sep_token_id]
        return (
            [self.cls_token_id]
            + list(ids0)
            + [self.sep_token_id, self.sep_token_id]
            + list(ids1)
            + [self.sep_token_id]
        )

    def create_token_type_ids_from_sequences(self, ids0, ids1=None):
        if ids1 is None:
            return [0] * (len(ids0) + 2)
        return [0] * (len(ids0) + 3) + [1] * (len(ids1) + 1)


class PairDummyTokenizer(DummyTokenizer):
    """Adds (query, document) pair encoding with padding/truncation/offset
    mappings — enough surface for the training collator."""

    eos_token_id = 2

    def _encode_pair(self, query: str, doc: str):
        q_ids = self._encode_text(query)
        d_ids = self._encode_text(doc)
        ids = [self.cls_token_id] + q_ids + [self.sep_token_id] + d_ids + [self.sep_token_id]
        offsets = (
            [(0, 0)]
            + [(i, i + 1) for i in range(len(query))]
            + [(0, 0)]
            + [(i, i + 1) for i in range(len(doc))]
            + [(0, 0)]
        )
        return ids, offsets

    def __call__(
        self,
        texts,
        add_special_tokens: bool = True,
        return_attention_mask: bool = True,
        padding=False,
        truncation=False,
        max_length=None,
        return_offsets_mapping: bool = False,
        return_tensors=None,
        **kwargs,
    ):
        if isinstance(texts, str):
            texts = [texts]
        all_ids, all_offsets = [], []
        for item in texts:
            if (
                isinstance(item, (list, tuple))
                and len(item) == 2
                and all(isinstance(x, str) for x in item)
            ):
                ids, offsets = self._encode_pair(item[0], item[1])
            else:
                text = item if isinstance(item, str) else "".join(item)
                ids = self.encode(text, add_special_tokens=add_special_tokens)
                offsets = [(i, i + 1) for i in range(len(ids))]
            if truncation and max_length is not None:
                ids = ids[:max_length]
                offsets = offsets[:max_length]
            all_ids.append(ids)
            all_offsets.append(offsets)

        attention = [[1] * len(ids) for ids in all_ids]
        if padding:
            target = (
                max_length
                if padding == "max_length" and max_length is not None
                else max(len(ids) for ids in all_ids)
            )
            for i, ids in enumerate(all_ids):
                pad_n = target - len(ids)
                all_ids[i] = ids + [self.pad_token_id] * pad_n
                attention[i] = attention[i] + [0] * pad_n
                all_offsets[i] = all_offsets[i] + [(0, 0)] * pad_n

        out = _Batch(all_ids)
        out["attention_mask"] = attention
        if return_offsets_mapping:
            out["offset_mapping"] = all_offsets
        return out
