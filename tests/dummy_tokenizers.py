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
