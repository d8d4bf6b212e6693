#!/usr/bin/env python3
"""Create offline toy assets: a tiny ModernBERT backbone dir (config + real
HF fast tokenizer built programmatically) and a synthetic context-relevance
dataset in the reference's schema (query/texts/context_spans/
context_spans_relevance/labels/teacher_score).

This replaces the reference's dependence on HF Hub downloads
(configs/toy-*.yaml pull hub datasets + backbones) for this offline
environment, enabling the full trainer CLI flow to run end to end.

Usage: python scripts/make_toy_assets.py [--out DIR] [--rows N]
"""

from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

WORDS = (
    "sushi ramen kyoto tokyo market dish travel spring budget spreadsheet "
    "deadline roommate plants bill electricity sleep answer question topic "
    "river mountain train station garden temple noodle chef counter rice "
    "green tea matcha festival summer winter autumn ticket flight hotel"
).split()


def build_tokenizer(save_dir: Path):
    """Whitespace WordLevel fast tokenizer with BERT-style pair template."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4}
    for word in WORDS:
        vocab.setdefault(word, len(vocab))
    for word in ("what who where when why how is are the a an of to in on "
                 "about your favorite best number sentence text").split():
        vocab.setdefault(word, len(vocab))
    for ch in ".,?!0123456789":
        vocab.setdefault(ch, len(vocab))

    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", vocab["[CLS]"]), ("[SEP]", vocab["[SEP]"])],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="[PAD]",
        unk_token="[UNK]",
        cls_token="[CLS]",
        sep_token="[SEP]",
        mask_token="[MASK]",
    )
    save_dir.mkdir(parents=True, exist_ok=True)
    fast.save_pretrained(str(save_dir))
    return fast, len(vocab)


def build_backbone_dir(save_dir: Path, vocab_size: int) -> None:
    """HF-style ModernBERT config.json (no weights → random init)."""
    config = {
        "model_type": "modernbert",
        "vocab_size": vocab_size,
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_hidden_layers": 4,
        "num_attention_heads": 4,
        "max_position_embeddings": 512,
        "local_attention": 32,
        "global_attn_every_n_layers": 3,
        "global_rope_theta": 160000.0,
        "local_rope_theta": 10000.0,
        "norm_eps": 1e-5,
        "norm_bias": False,
        "pad_token_id": 0,
        "cls_token_id": 2,
        "sep_token_id": 3,
        "num_labels": 1,
        "classifier_pooling": "cls",
    }
    save_dir.mkdir(parents=True, exist_ok=True)
    (save_dir / "config.json").write_text(json.dumps(config, indent=2))


def make_row(rng: random.Random, tokenizer, query_topic: str):
    """One training row: 2 docs; relevant sentences mention the query topic."""
    def sentence(relevant: bool) -> str:
        words = [rng.choice(WORDS) for _ in range(rng.randint(4, 8))]
        if relevant:
            words.insert(rng.randrange(len(words)), query_topic)
        return " ".join(words) + " ."

    texts, spans_all, relevance_all, labels, teacher = [], [], [], [], []
    for doc_idx in range(2):
        n_sent = rng.randint(2, 4)
        has_relevant = doc_idx == 0
        rel_mask = [
            1 if (has_relevant and i == rng.randrange(n_sent)) else 0
            for i in range(n_sent)
        ]
        if has_relevant and not any(rel_mask):
            rel_mask[0] = 1
        sentences = [sentence(bool(r)) for r in rel_mask]
        text = " ".join(sentences)
        spans = []
        cursor = 0
        for i, s in enumerate(sentences):
            start = text.index(s, cursor)
            end = start + len(s)
            spans.append([start, end])
            cursor = end
        texts.append(text)
        spans_all.append(spans)
        relevance_all.append(rel_mask)
        labels.append(1 if has_relevant else 0)
        teacher.append(rng.uniform(0.7, 0.95) if has_relevant else rng.uniform(0.02, 0.2))
    return {
        "query": f"what about {query_topic} ?",
        "texts": texts,
        "context_spans": spans_all,
        "context_spans_relevance": relevance_all,
        "labels": labels,
        "teacher_score": teacher,
    }


def build_dataset(save_dir: Path, tokenizer, rows: int, seed: int = 0) -> None:
    from datasets import Dataset, DatasetDict

    rng = random.Random(seed)
    train_rows = [make_row(rng, tokenizer, rng.choice(WORDS)) for _ in range(rows)]
    val_rows = [make_row(rng, tokenizer, rng.choice(WORDS)) for _ in range(max(4, rows // 10))]

    def to_dict(items):
        return {k: [row[k] for row in items] for k in items[0]}

    DatasetDict(
        {
            "train": Dataset.from_dict(to_dict(train_rows)),
            "validation": Dataset.from_dict(to_dict(val_rows)),
        }
    ).save_to_disk(str(save_dir))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="toy_assets")
    parser.add_argument("--rows", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    out = Path(args.out)
    tokenizer, vocab_size = build_tokenizer(out / "backbone")
    build_backbone_dir(out / "backbone", vocab_size)
    build_dataset(out / "dataset", tokenizer, args.rows, seed=args.seed)
    print(f"toy assets written to {out}/ (backbone + dataset, vocab={vocab_size})")


if __name__ == "__main__":
    main()
