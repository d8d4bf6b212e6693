"""Manual-specials probe across real fast-tokenizer behaviors (offline
counterpart of the reference's test_tokenizer_special_tokens.py, which
checks 4 hub models): a BERT-style template tokenizer keeps specials, a
ModernBERT-like one (no pair template for pre-tokenized input) requires
manual injection, and block inputs stay consistent either way."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def _word_level_tokenizer(with_pair_template: bool):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for word in "open provence query document test alpha beta".split():
        vocab[word] = len(vocab)
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    if with_pair_template:
        tok.post_processor = TemplateProcessing(
            single="[CLS] $A [SEP]",
            pair="[CLS] $A [SEP] $B:1 [SEP]:1",
            special_tokens=[("[CLS]", 2), ("[SEP]", 3)],
        )
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="[PAD]", unk_token="[UNK]", cls_token="[CLS]", sep_token="[SEP]",
    )


def test_bert_fast_tokenizer_keeps_specials(tmp_path):
    """BertTokenizerFast overrides build_inputs_with_special_tokens → no
    manual injection needed (the reference's BERT-family path)."""
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "open", "provence", "query", "document", "test", "alpha", "beta"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    bert_tok = BertTokenizerFast(vocab_file=str(vocab_file), do_lower_case=True)

    from open_provence_tpu.text.tokenizer import TokenizerAdapter

    adapter = TokenizerAdapter(bert_tok)
    assert not adapter.manual_special_tokens

    from open_provence_tpu.text import FragmentRecord

    query = adapter.encode("open query", add_special_tokens=False)
    frag_ids = adapter.encode("alpha beta", add_special_tokens=False)
    frag = FragmentRecord("alpha beta", 0, 0, 0, len(frag_ids), frag_ids)
    input_ids, _, _, ranges = adapter.prepare_block_inputs(query, [frag])
    assert input_ids[0] == bert_tok.cls_token_id
    assert input_ids.count(bert_tok.sep_token_id) == 2
    (start, end), = ranges
    assert input_ids[start:end] == frag_ids


def test_generic_fast_tokenizer_requires_manual_specials_even_with_template():
    """A plain PreTrainedTokenizerFast (like ModernBERT's) does NOT apply
    its post_processor in build_inputs_with_special_tokens — the exact quirk
    the manual-specials probe exists for (reference standalone:1501-1538)."""
    from open_provence_tpu.text.tokenizer import TokenizerAdapter

    adapter = TokenizerAdapter(_word_level_tokenizer(True))
    assert adapter.manual_special_tokens


def test_templateless_tokenizer_requires_manual_specials():
    from open_provence_tpu.text.tokenizer import TokenizerAdapter

    adapter = TokenizerAdapter(_word_level_tokenizer(False))
    # build_inputs_with_special_tokens drops CLS/SEP → manual injection.
    assert adapter.manual_special_tokens
    assert adapter.manual_cls_token_id == 2
    assert adapter.manual_sep_token_id == 3

    from open_provence_tpu.text import FragmentRecord

    query = adapter.encode("open query", add_special_tokens=False)
    frag_ids = adapter.encode("alpha beta", add_special_tokens=False)
    frag = FragmentRecord("alpha beta", 0, 0, 0, len(frag_ids), frag_ids)
    input_ids, _, type_ids, ranges = adapter.prepare_block_inputs(query, [frag])
    # Manual layout: [CLS] q... [SEP] frag... [SEP]
    assert input_ids[0] == 2
    assert input_ids[len(query) + 1] == 3
    assert input_ids[-1] == 3
    (start, end), = ranges
    assert input_ids[start:end] == frag_ids
    assert len(type_ids) == len(input_ids)


def test_toy_wordlevel_tokenizer_roundtrip_decode():
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from make_toy_assets import build_tokenizer

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        tokenizer, _ = build_tokenizer(Path(tmp))
        ids = tokenizer.encode("sushi ramen kyoto", add_special_tokens=False)
        assert tokenizer.decode(ids) == "sushi ramen kyoto"
        pair = tokenizer([["sushi", "ramen kyoto"]])
        row = pair["input_ids"][0]
        assert row[0] == tokenizer.cls_token_id
        assert row.count(tokenizer.sep_token_id) == 2
