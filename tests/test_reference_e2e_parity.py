"""End-to-end process() parity vs the reference implementation.

Builds the reference's torch OpenProvenceModel (tiny ModernBERT backbone,
random init) and this framework's JAX OpenProvenceModel from the SAME
converted weights and the SAME real HF fast tokenizer, runs process() on
identical inputs, and compares pruned text, keep decisions, scores, and
compression. This is the strongest contract check: any divergence in
fragmentation, block packing, tokenizer-edge handling, forward numerics, or
postprocess aggregation shows up here.

Gated on /root/reference being mounted (CI-equivalent of the reference's
checkpoint-gated integration tests, SURVEY §4).
"""

import re
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = (REFERENCE_ROOT / "open_provence").exists()

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")


def _simple_en_splitter(text: str) -> list[str]:
    """Deterministic whitespace-preserving splitter shared by both sides
    (punkt data is unavailable offline; the splitter is an injectable
    dependency in both implementations)."""
    if not text:
        return []
    parts = re.findall(r".*?(?:[.!?](?:\s+|$)|\n+|$)", text, flags=re.S)
    return [p for p in parts if p]


@pytest.fixture(scope="module")
def both_models(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import open_provence.modeling_open_provence_standalone as ref

    tmp = tmp_path_factory.mktemp("assets")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from make_toy_assets import build_tokenizer

    tokenizer, vocab_size = build_tokenizer(tmp / "tok")

    base_model_config = {
        "model_type": "modernbert",
        "vocab_size": vocab_size,
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_hidden_layers": 4,
        "num_attention_heads": 4,
        "max_position_embeddings": 256,
        "local_attention": 16,
        "global_attn_every_n_layers": 3,
        "norm_eps": 1e-5,
        "norm_bias": False,
        "pad_token_id": 0,
        "cls_token_id": 2,
        "sep_token_id": 3,
        "reference_compile": False,
        "attn_implementation": "eager",
    }
    ref_config = ref.OpenProvenceConfig(
        base_model_config=base_model_config,
        tokenizer_name_or_path=str(tmp / "tok"),
        num_labels=1,
        num_pruning_labels=2,
        max_length=64,
        pruning_config={"hidden_size": 64, "classifier_dropout": 0.0},
    )
    torch.manual_seed(0)
    ref_model = ref.OpenProvenceModel(ref_config)
    ref_model.eval()

    from open_provence_tpu.configs import OpenProvenceConfig
    from open_provence_tpu.inference import OpenProvenceModel
    from open_provence_tpu.utils.hf_convert import hf_to_flax_params

    my_config = OpenProvenceConfig(
        base_model_config=base_model_config,
        num_labels=1,
        pruning_config={"hidden_size": 64, "classifier_dropout": 0.0},
        max_length=64,
    )
    params = hf_to_flax_params(ref_model.state_dict(), my_config)
    my_model = OpenProvenceModel(
        my_config, params, tokenizer, attention_impl="xla", bucket_step=16
    )
    return ref_model, my_model


CONTEXT = (
    "sushi is the best dish in kyoto market . "
    "budget spreadsheet deadline piled in the morning . "
    "travel to tokyo in spring for the festival . "
    "plants and electricity bill before sleep ."
)
QUERY = "what about sushi in kyoto ?"


def _run_both(ref_model, my_model, question, context, **kwargs):
    common = dict(
        title=None,
        sentence_splitter=_simple_en_splitter,
        show_progress=False,
        return_sentence_metrics=True,
        return_sentence_texts=True,
        batch_size=4,
    )
    common.update(kwargs)
    ref_out = ref_model.process(question, context, **common)
    my_out = my_model.process(question, context, **common)
    return ref_out, my_out


@pytest.mark.parametrize("threshold", [0.2, 0.5, 0.8])
def test_process_parity_single_pair(both_models, threshold):
    ref_model, my_model = both_models
    ref_out, my_out = _run_both(ref_model, my_model, QUERY, CONTEXT, threshold=threshold)

    ref_probs = np.asarray(ref_out["sentence_probabilities"], dtype=np.float64)
    my_probs = np.asarray(my_out["sentence_probabilities"], dtype=np.float64)
    assert ref_probs.shape == my_probs.shape
    np.testing.assert_allclose(my_probs, ref_probs, atol=2e-3)
    # Keep decisions must agree when probabilities are not within noise of
    # the threshold.
    decisive = np.abs(ref_probs - threshold) > 5e-3
    assert np.all((my_probs > threshold)[decisive] == (ref_probs > threshold)[decisive])
    if bool(np.all(decisive)):
        assert my_out["pruned_context"] == ref_out["pruned_context"]
        assert my_out["kept_sentences"] == ref_out["kept_sentences"]
        assert my_out["removed_sentences"] == ref_out["removed_sentences"]
        np.testing.assert_allclose(
            my_out["compression_rate"], ref_out["compression_rate"], atol=1e-6
        )
    np.testing.assert_allclose(
        my_out["reranking_score"], ref_out["reranking_score"], atol=2e-3
    )


def test_process_parity_long_multiblock(both_models):
    """Context much longer than max_length → multi-fragment, multi-block
    path, including ModernBERT manual-specials tokenizer handling."""
    ref_model, my_model = both_models
    long_context = " ".join(
        f"sentence number {i} about {w} in the market ."
        for i, w in enumerate(["sushi", "ramen", "kyoto", "budget", "plants",
                               "train", "temple", "river", "matcha", "hotel"] * 4)
    )
    ref_out, my_out = _run_both(
        ref_model, my_model, QUERY, long_context, threshold=0.5
    )
    ref_probs = np.asarray(ref_out["sentence_probabilities"], dtype=np.float64)
    my_probs = np.asarray(my_out["sentence_probabilities"], dtype=np.float64)
    assert ref_probs.shape == my_probs.shape
    np.testing.assert_allclose(my_probs, ref_probs, atol=2e-3)
    np.testing.assert_allclose(
        my_out["reranking_score"], ref_out["reranking_score"], atol=2e-3
    )


def test_process_parity_batched_nested_with_titles(both_models):
    ref_model, my_model = both_models
    questions = ["what about sushi ?", "what about budget ?"]
    contexts = [
        [CONTEXT, "ramen shop near the station ."],
        ["budget deadline spreadsheet . sleep later ."],
    ]
    titles = [["Sushi Doc", "Ramen Doc"], ["Budget Doc"]]
    common = dict(
        sentence_splitter=_simple_en_splitter,
        show_progress=False,
        return_sentence_metrics=True,
        batch_size=4,
        threshold=0.5,
        always_select_title=True,
    )
    ref_out = ref_model.process(questions, contexts, title=titles, **common)
    my_out = my_model.process(questions, contexts, title=titles, **common)

    assert my_out["title"] == ref_out["title"]
    for q in range(2):
        for c in range(len(contexts[q])):
            ref_probs = np.asarray(
                ref_out["sentence_probabilities"][q][c], dtype=np.float64
            )
            my_probs = np.asarray(
                my_out["sentence_probabilities"][q][c], dtype=np.float64
            )
            assert ref_probs.shape == my_probs.shape
            np.testing.assert_allclose(my_probs, ref_probs, atol=2e-3)
            np.testing.assert_allclose(
                my_out["reranking_score"][q][c],
                ref_out["reranking_score"][q][c],
                atol=2e-3,
            )


@pytest.mark.parametrize(
    "kwargs",
    [
        {"strip_sentences": True},
        {"respect_sentence_boundaries": True},
        {"use_best_reranker_score": False},
        {"zero_score_when_empty": False},
        # Title prefixes exercise the prefix-token-count offset correction;
        # combined with strip_sentences the counts must come from the
        # NORMALIZED prefix text (the trailing "\n" on the last prefix is
        # stripped, which can change BPE token counts).
        {"title": "sushi market report"},
        {"title": "sushi market report", "strip_sentences": True},
    ],
    ids=[
        "strip",
        "respect_boundaries",
        "first_block_score",
        "keep_empty_score",
        "title_prefix",
        "title_prefix_strip",
    ],
)
def test_process_parity_flag_variants(both_models, kwargs):
    ref_model, my_model = both_models
    long_context = " ".join(
        f"sentence number {i} about {w} ." for i, w in enumerate(
            ["sushi", "ramen", "kyoto", "budget", "plants", "train"] * 6
        )
    )
    ref_out, my_out = _run_both(
        ref_model, my_model, QUERY, long_context, threshold=0.5, **kwargs
    )
    ref_probs = np.asarray(ref_out["sentence_probabilities"], dtype=np.float64)
    my_probs = np.asarray(my_out["sentence_probabilities"], dtype=np.float64)
    assert ref_probs.shape == my_probs.shape
    np.testing.assert_allclose(my_probs, ref_probs, atol=2e-3)
    if ref_out["reranking_score"] is None:
        assert my_out["reranking_score"] is None
    else:
        np.testing.assert_allclose(
            my_out["reranking_score"], ref_out["reranking_score"], atol=2e-3
        )
    # Sentence segmentation and keep/remove structure must agree exactly.
    assert [len(x) for x in (my_out["kept_sentences"], my_out["removed_sentences"])] == [
        len(x) for x in (ref_out["kept_sentences"], ref_out["removed_sentences"])
    ]


def test_process_parity_reorder_top_k(both_models):
    ref_model, my_model = both_models
    contexts = [
        "sushi kyoto market dish .",
        "budget deadline spreadsheet boring .",
        "plants water electricity bill .",
    ]
    common = dict(
        sentence_splitter=_simple_en_splitter,
        show_progress=False,
        threshold=0.5,
        reorder=True,
        top_k=2,
        batch_size=4,
    )
    ref_out = ref_model.process(QUERY, contexts, title=None, **common)
    my_out = my_model.process(QUERY, contexts, title=None, **common)
    assert len(my_out["pruned_context"]) == len(ref_out["pruned_context"]) == 2
    np.testing.assert_allclose(
        my_out["reranking_score"], ref_out["reranking_score"], atol=2e-3
    )
    assert my_out["pruned_context"] == ref_out["pruned_context"]


def test_process_parity_raw_predictions(both_models):
    ref_model, my_model = both_models
    contexts = ["sushi market kyoto . ", "budget deadline spreadsheet ."]
    ref_raw = ref_model.get_raw_predictions(QUERY, contexts)
    my_raw = my_model.get_raw_predictions(QUERY, contexts)
    assert my_raw.context_ranges == ref_raw.context_ranges
    np.testing.assert_allclose(
        my_raw.pruning_probs, ref_raw.pruning_probs, atol=2e-3
    )
    np.testing.assert_allclose(
        my_raw.ranking_score, ref_raw.ranking_score, atol=2e-3
    )


def _assert_nested_close(mine, theirs, atol, path=""):
    """Recursively compare (possibly nested) lists of floats/strings."""
    if isinstance(theirs, (list, tuple)):
        assert isinstance(mine, (list, tuple)) and len(mine) == len(theirs), (
            path, mine, theirs)
        for i, (a, b) in enumerate(zip(mine, theirs)):
            _assert_nested_close(a, b, atol, f"{path}[{i}]")
    elif isinstance(theirs, float):
        np.testing.assert_allclose(mine, theirs, atol=atol, err_msg=path)
    else:
        assert mine == theirs, (path, mine, theirs)


@pytest.mark.slow
def test_process_parity_fuzz(both_models):
    """Seeded random workloads over the full kwargs surface: shapes
    (str/list/aligned/nested), titles (none/explicit/list/first_sentence),
    strip/respect/always_select/reorder/top_k/threshold combinations. Any
    divergence in splitting, fragmentation, packing, specials handling,
    prefix-offset accounting, or postprocess aggregation trips this."""
    import random

    ref_model, my_model = both_models
    rng = random.Random(20260817)
    words = ["sushi", "ramen", "kyoto", "market", "budget", "deadline",
             "travel", "plants", "spring", "festival", "morning", "tokyo"]
    enders = [". ", "! ", "? ", ".\n", ". "]

    def sentence():
        return " ".join(rng.choice(words) for _ in range(rng.randrange(2, 9))) + rng.choice(enders)

    def context():
        return "".join(sentence() for _ in range(rng.randrange(1, 7))).rstrip("\n")

    for trial in range(12):
        n_q = rng.randrange(1, 3)
        questions = [
            " ".join(rng.choice(words) for _ in range(rng.randrange(2, 5))) + " ?"
            for _ in range(n_q)
        ]
        n_docs = [rng.randrange(1, 4) for _ in range(n_q)]
        contexts = [[context() for _ in range(n)] for n in n_docs]
        title_mode = rng.choice(["none", "first_sentence", "explicit", "lists"])
        if title_mode == "none":
            title = None
        elif title_mode == "first_sentence":
            title = "first_sentence"
        elif title_mode == "explicit":
            title = [
                [" ".join(rng.choice(words) for _ in range(2))] * n for n in n_docs
            ]
        else:
            title = [
                [[" ".join(rng.choice(words) for _ in range(2))] for _ in range(n)]
                for n in n_docs
            ]
        kwargs = dict(
            title=title,
            threshold=rng.choice([0.2, 0.5, 0.8]),
            strip_sentences=rng.random() < 0.3,
            respect_sentence_boundaries=rng.random() < 0.3,
            always_select_title=rng.random() < 0.3,
            use_best_reranker_score=rng.random() < 0.7,
            sentence_splitter=_simple_en_splitter,
            show_progress=False,
            return_sentence_metrics=True,
            return_sentence_texts=True,
            batch_size=4,
        )
        if rng.random() < 0.3:
            kwargs["reorder"] = True
            kwargs["top_k"] = rng.randrange(1, 3)
        if n_q == 1:
            q_in, c_in = questions[0], contexts[0]
        else:
            q_in, c_in = questions, contexts
        ref_out = ref_model.process(q_in, c_in, **kwargs)
        my_out = my_model.process(q_in, c_in, **kwargs)
        note = f"trial {trial}"
        _assert_nested_close(
            my_out["sentence_probabilities"],
            ref_out["sentence_probabilities"],
            2e-3,
            note + " probs",
        )
        _assert_nested_close(
            my_out["reranking_score"], ref_out["reranking_score"], 2e-3,
            note + " score",
        )
        _assert_nested_close(
            my_out["compression_rate"], ref_out["compression_rate"], 0.2,
            note + " compression",
        )
        assert my_out["title"] == ref_out["title"], note
        # Keep decisions / output text agree exactly unless some sentence
        # probability sits within numeric noise of the threshold.
        def _flatten(x, out):
            if isinstance(x, (list, tuple)):
                for y in x:
                    _flatten(y, out)
            else:
                out.append(float(x))
        probs = []
        _flatten(ref_out["sentence_probabilities"], probs)
        if probs and np.abs(np.asarray(probs) - kwargs["threshold"]).min() > 5e-3:
            assert my_out["pruned_context"] == ref_out["pruned_context"], note
            assert my_out["kept_sentences"] == ref_out["kept_sentences"], note
            assert my_out["removed_sentences"] == ref_out["removed_sentences"], note


def test_process_parity_unk_only_sentences(both_models):
    """Sentences tokenizing entirely to UNK decode to empty text; the
    empty-fragment filter must drop them exactly as the reference does
    (this also exercises the engine's filter_only decode shortcut)."""
    ref_model, my_model = both_models
    context = (
        "sushi is the best dish in kyoto . "
        "日本語 文章 です 。 "
        "budget deadline spreadsheet piled up . "
        "🍣 🍜 ∆ . "
        "travel to tokyo in spring ."
    )
    for strip in (False, True):
        ref_out, my_out = _run_both(
            ref_model, my_model, QUERY, context, threshold=0.5,
            strip_sentences=strip,
        )
        ref_probs = np.asarray(ref_out["sentence_probabilities"], dtype=np.float64)
        my_probs = np.asarray(my_out["sentence_probabilities"], dtype=np.float64)
        assert ref_probs.shape == my_probs.shape, (strip, ref_probs, my_probs)
        np.testing.assert_allclose(my_probs, ref_probs, atol=2e-3)
        assert my_out["kept_sentences"] == ref_out["kept_sentences"], strip
        assert my_out["removed_sentences"] == ref_out["removed_sentences"], strip
        assert my_out["pruned_context"] == ref_out["pruned_context"], strip
