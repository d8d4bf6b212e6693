"""OpenProvenceEncoder API tests: predict/predict_with_pruning/
predict_context/prune/prune_texts + checkpoint IO, using the toy WordLevel
fast tokenizer (real offsets/token_type_ids path)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def encoder(tmp_path_factory):
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from make_toy_assets import build_backbone_dir, build_tokenizer

    tmp = tmp_path_factory.mktemp("enc")
    tokenizer, vocab_size = build_tokenizer(tmp / "backbone")
    build_backbone_dir(tmp / "backbone", vocab_size)

    from open_provence_tpu.encoder import OpenProvenceEncoder

    return OpenProvenceEncoder(
        tmp / "backbone",
        tokenizer=tokenizer,
        max_length=64,
        attention_impl="xla",
        bucket_step=16,
    )


PAIRS = [
    ("what about sushi ?", "sushi is the best dish . budget deadline boring ."),
    ("what about plants ?", "water the plants . sushi market far away ."),
]


def test_predict_scores(encoder):
    scores = encoder.predict(PAIRS, batch_size=2)
    assert isinstance(scores, np.ndarray)
    assert scores.shape == (2,)
    single = encoder.predict(PAIRS[0])
    assert single.shape == (1,)
    np.testing.assert_allclose(single[0], scores[0], atol=1e-5)


def test_predict_with_pruning_thresholds(encoder):
    out = encoder.predict_with_pruning(PAIRS[0], pruning_threshold=0.0, return_documents=True)
    # threshold 0 keeps every document token → compression 0, document intact
    assert out.compression_ratio == 0.0
    assert out.num_pruned_sentences == 0
    assert "sushi" in out.pruned_documents[0]
    out = encoder.predict_with_pruning(PAIRS[0], pruning_threshold=1.0, return_documents=True)
    assert out.compression_ratio == 1.0
    assert out.pruned_documents[0] == ""


def test_predict_with_pruning_batch(encoder):
    outs = encoder.predict_with_pruning(PAIRS, pruning_threshold=0.5, return_documents=True)
    assert len(outs) == 2
    for out in outs:
        assert 0.0 <= out.compression_ratio <= 1.0
        assert out.pruning_masks is not None


def test_predict_context_chunks(encoder):
    doc = PAIRS[0][1]
    boundary = doc.index(". ") + 2
    chunks = [(0, boundary), (boundary, len(doc))]
    out = encoder.predict_context(PAIRS[0], chunks, token_threshold=0.0, chunk_threshold=0.5)
    assert out.chunk_scores.shape == (2,)
    # token_threshold 0 → every token above → all chunks predicted 1.
    assert out.chunk_predictions.tolist() == [1, 1]
    assert out.compression_ratio == 0.0
    out = encoder.predict_context(PAIRS[0], chunks, token_threshold=1.0, chunk_threshold=0.5)
    assert out.chunk_predictions.tolist() == [0, 0]
    assert out.compression_ratio == 1.0


def test_prune_and_prune_texts(encoder):
    pruned = encoder.prune(*PAIRS[0], threshold=0.0)
    assert isinstance(pruned, str) and "sushi" in pruned
    detailed = encoder.prune(*PAIRS[0], threshold=0.0, return_sentences=True)
    assert detailed["compression_ratio"] == 0.0
    assert detailed["ranking_score"] is not None

    results = encoder.prune_texts(
        [p[0] for p in PAIRS], [p[1] for p in PAIRS], threshold=0.0
    )
    assert len(results) == 2
    assert all(r["kept_ratio"] == 1.0 for r in results)


def test_save_and_reload_roundtrip(encoder, tmp_path):
    save_dir = encoder.save_pretrained(tmp_path / "ckpt")
    assert (save_dir / "model.safetensors").exists()
    assert (save_dir / "config.json").exists()

    from open_provence_tpu.encoder import OpenProvenceEncoder

    reloaded = OpenProvenceEncoder.from_pretrained(
        save_dir, tokenizer=encoder.tokenizer, attention_impl="xla", bucket_step=16
    )
    orig = encoder.predict(PAIRS)
    new = reloaded.predict(PAIRS)
    np.testing.assert_allclose(new, orig, atol=1e-5)

    # Same checkpoint loads through the inference engine too.
    from open_provence_tpu.inference import OpenProvenceModel

    model = OpenProvenceModel.from_pretrained(
        save_dir, tokenizer=encoder.tokenizer, attention_impl="xla", bucket_step=16
    )
    result = model.process(PAIRS[0][0], PAIRS[0][1], threshold=0.0, show_progress=False)
    assert result["pruned_context"] == PAIRS[0][1]


def test_export_ranking_model(encoder, tmp_path):
    out_dir = encoder.export_ranking_model(tmp_path / "ranking_only")
    from safetensors.numpy import load_file

    sd = load_file(str(out_dir / "model.safetensors"))
    assert not any(k.startswith("pruning_head") for k in sd)
    assert any(k.startswith("model.embeddings") for k in sd)
    assert "classifier.weight" in sd
