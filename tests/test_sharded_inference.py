"""Data-parallel inference over a mesh: process() on the 8-device virtual
CPU mesh must produce the same results as single-device."""

import numpy as np
import pytest

# 8-device-mesh integration tests: heavy jit compiles, excluded from the
# default fast suite (run with `pytest -m slow`).
pytestmark = pytest.mark.slow

import jax


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_process_sharded_matches_single_device():
    from open_provence_tpu.parallel.mesh import create_mesh
    from open_provence_tpu.inference import OpenProvenceModel
    from tests.test_process_engine import _tiny_model

    single = _tiny_model()
    mesh = create_mesh(data=8, model=1)
    sharded = OpenProvenceModel(
        single.config,
        single.params,
        single.tokenizer,
        attention_impl="xla",
        bucket_step=16,
        mesh=mesh,
    )

    contexts = [
        f"Sentence number {i} about topic {i}. Another line {i} here." for i in range(6)
    ]
    questions = [f"question {i}?" for i in range(6)]

    r_single = single.process(
        questions, contexts, threshold=0.3, show_progress=False,
        return_sentence_metrics=True,
    )
    r_sharded = sharded.process(
        questions, contexts, threshold=0.3, show_progress=False,
        return_sentence_metrics=True,
    )
    assert r_sharded["pruned_context"] == r_single["pruned_context"]
    for a, b in zip(r_sharded["reranking_score"], r_single["reranking_score"]):
        np.testing.assert_allclose(a, b, atol=1e-5)
    for a, b in zip(
        r_sharded["sentence_probabilities"], r_single["sentence_probabilities"]
    ):
        np.testing.assert_allclose(a, b, atol=1e-5)

    raw_single = single.get_raw_predictions("q?", ["chunk one. ", "chunk two."])
    raw_sharded = sharded.get_raw_predictions("q?", ["chunk one. ", "chunk two."])
    np.testing.assert_allclose(
        raw_sharded.pruning_probs, raw_single.pruning_probs, atol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_process_tensor_parallel_matches_single_device():
    """dp=4 x tp=2 mesh: attention/MLP weights sharded over the model axis."""
    from open_provence_tpu.parallel.mesh import create_mesh
    from open_provence_tpu.inference import OpenProvenceModel
    from tests.test_process_engine import _tiny_model

    single = _tiny_model()
    mesh = create_mesh(data=4, model=2)
    sharded = OpenProvenceModel(
        single.config,
        single.params,
        single.tokenizer,
        attention_impl="xla",
        bucket_step=16,
        mesh=mesh,
        tensor_parallel=True,
    )
    question = "what about topic?"
    context = "Sentence about topic one. Sentence about other two."
    r_single = single.process(question, context, threshold=0.3, show_progress=False,
                              return_sentence_metrics=True)
    r_sharded = sharded.process(question, context, threshold=0.3, show_progress=False,
                                return_sentence_metrics=True)
    assert r_sharded["pruned_context"] == r_single["pruned_context"]
    np.testing.assert_allclose(
        r_sharded["sentence_probabilities"], r_single["sentence_probabilities"],
        atol=1e-5,
    )
