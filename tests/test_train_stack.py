"""Training stack tests: collator labels, loss numerics (golden vs torch),
dataset ops (golden vs reference), trainer smoke on the 8-device CPU mesh,
checkpoint save/resume/export."""

import sys
from pathlib import Path

import numpy as np
import pytest

from tests.dummy_tokenizers import PairDummyTokenizer

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = (REFERENCE_ROOT / "open_provence").exists()


# --- collator ---------------------------------------------------------------


def _features():
    # Two queries; docs with char spans separated by single spaces (matching
    # the v2 label generator's space-joined progressive encoding — reference
    # data_collator.py:535-540). Char tokenizer → exact positions.
    return [
        {
            "query": "qq",
            "texts": ["abc def", "ghij"],
            "context_spans": [[[0, 3], [4, 7]], [[0, 4]]],
            "context_spans_relevance": [[1, 0], [0]],
            "labels": [1, 0],
            "teacher_score": [0.9, 0.2],
        },
        {
            "query": "zz",
            "texts": ["kl mno"],
            "context_spans": [[[0, 2], [3, 6]]],
            "context_spans_relevance": [[0, 1]],
            "labels": [1],
            "teacher_score": [0.7],
        },
    ]


def test_collator_shapes_and_targets():
    from open_provence_tpu.train.collator import OpenProvenceDataCollator

    collator = OpenProvenceDataCollator(
        tokenizer=PairDummyTokenizer(),
        max_length=32,
        scores_column="teacher_score",
        chunks_pos_column="context_spans",
        relevant_chunks_column="context_spans_relevance",
        pair_multiple=4,
    )
    batch = collator(_features())
    assert batch["input_ids"].shape == (4, 32)
    assert batch["pruning_labels"].shape == (4, 32)
    assert batch["pair_mask"].tolist() == [1.0, 1.0, 1.0, 0.0]
    np.testing.assert_allclose(batch["ranking_targets"][:3], [0.9, 0.2, 0.7])
    assert batch["batch_indices"][:3].tolist() == [0, 0, 1]
    assert batch["doc_indices"][:3].tolist() == [0, 1, 0]


def test_collator_label_positions():
    """Char tokenizer: [CLS] q q [SEP] d... — doc starts at token 4; relevant
    span chars → label 1, others → 0, query/specials → -100."""
    from open_provence_tpu.train.collator import OpenProvenceDataCollator

    collator = OpenProvenceDataCollator(
        tokenizer=PairDummyTokenizer(),
        max_length=16,
        scores_column="teacher_score",
        chunks_pos_column="context_spans",
        relevant_chunks_column="context_spans_relevance",
        pair_multiple=1,
    )
    batch = collator(_features()[:1])
    labels = batch["pruning_labels"][0]
    # Pair 0: query "qq", doc "abc def"; spans [0,3) rel=1, [4,7) rel=0.
    # Layout: [CLS] q q [SEP] a b c ␣ d e f [SEP] pad...
    assert labels[:4].tolist() == [-100, -100, -100, -100]
    assert labels[4:7].tolist() == [1, 1, 1]
    # Second span's tokens (space-joined progressive window ␣ d e f) → 0.
    assert labels[7:11].tolist() == [0, 0, 0, 0]
    assert all(v == -100 for v in labels[11:])


def test_collator_binary_mask_conversion():
    from open_provence_tpu.train.span_labels import normalize_relevant_chunks

    chunks_pos = [[[0, 3], [3, 6], [6, 9]], [[0, 2]]]
    raw = [[1, 0, 1], [2]]
    out = normalize_relevant_chunks(raw, chunks_pos)
    assert out[0] == [0, 2]
    assert out[1] == [2]


def test_collator_pad_pairs_to_overflow():
    from open_provence_tpu.train.collator import OpenProvenceDataCollator

    collator = OpenProvenceDataCollator(
        tokenizer=PairDummyTokenizer(), max_length=16, pad_pairs_to=2,
        scores_column="teacher_score",
        chunks_pos_column="context_spans",
        relevant_chunks_column="context_spans_relevance",
    )
    with pytest.raises(ValueError):
        collator(_features())  # 4 pairs > 2


def test_collator_missing_columns():
    from open_provence_tpu.train.collator import OpenProvenceDataCollator

    collator = OpenProvenceDataCollator(
        tokenizer=PairDummyTokenizer(), max_length=16,
        chunks_pos_column="context_spans",
        relevant_chunks_column="context_spans_relevance",
    )
    with pytest.raises(ValueError, match="Missing required columns"):
        collator([{"query": "q"}])


# --- losses (golden vs torch) ----------------------------------------------


def test_loss_golden_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from open_provence_tpu.train.losses import joint_loss

    rng = np.random.default_rng(0)
    P, L = 6, 10
    ranking_logits = rng.normal(size=(P, 2)).astype(np.float32)
    pruning_logits = rng.normal(size=(P, L, 2)).astype(np.float32)
    targets = rng.uniform(size=(P,)).astype(np.float32)
    labels = rng.integers(0, 2, size=(P, L))
    labels[:, :3] = -100  # query region ignored
    labels[-1, :] = -100  # one fully ignored row
    pair_mask = np.ones((P,), dtype=np.float32)

    total, components = joint_loss(
        {"ranking_logits": ranking_logits, "pruning_logits": pruning_logits},
        {
            "ranking_targets": targets,
            "pruning_labels": labels,
            "pair_mask": pair_mask,
        },
    )

    t_rank = F.mse_loss(
        torch.tensor(ranking_logits)[:, 0], torch.tensor(targets)
    ).item()
    t_prune = F.cross_entropy(
        torch.tensor(pruning_logits).view(-1, 2),
        torch.tensor(labels).view(-1),
        ignore_index=-100,
    ).item()
    np.testing.assert_allclose(float(components["ranking_loss"]), t_rank, rtol=1e-5)
    np.testing.assert_allclose(float(components["pruning_loss"]), t_prune, rtol=1e-5)
    np.testing.assert_allclose(float(total), 0.05 * t_rank + 1.0 * t_prune, rtol=1e-5)


def test_loss_all_ignored_is_zero():
    from open_provence_tpu.train.losses import pruning_loss

    logits = np.random.default_rng(0).normal(size=(2, 4, 2)).astype(np.float32)
    labels = np.full((2, 4), -100)
    mask = np.ones((2,), dtype=np.float32)
    assert float(pruning_loss(logits, labels, mask)) == 0.0


def test_loss_pair_mask_excludes_padding():
    from open_provence_tpu.train.losses import ranking_loss

    logits = np.array([[1.0], [100.0]], dtype=np.float32)
    targets = np.array([1.0, 0.0], dtype=np.float32)
    mask = np.array([1.0, 0.0], dtype=np.float32)
    # Padded pair (huge error) must not contribute.
    assert float(ranking_loss(logits, targets, mask)) == pytest.approx(0.0)


# --- dataset ops (golden vs reference) ---------------------------------------


def _toy_dataset():
    from datasets import Dataset

    rows = {
        "query": ["q1", "q2", "q3"],
        "labels": [[1, 0, 0], [0, 1, 0], [0, 0, 0]],
        "texts": [["a", "b", "c"], ["d", "e", "f"], ["g", "h", "i"]],
        "context_spans_relevance": [
            [[1, 0], [0, 0], [0, 1]],
            [[0, 0], [1, 1], [0, 0]],
            [[0, 0], [0, 0], [0, 0]],
        ],
    }
    return Dataset.from_dict(rows)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_golden_dataset_ops():
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    from open_provence import trainer as ref_trainer

    from open_provence_tpu.train.data import (
        filter_pruning_dataset,
        sample_items_by_label_priority,
        upsample_dataset,
    )
    from open_provence_tpu.train.trainer import calculate_dynamic_steps

    ds = _toy_dataset()
    ours = filter_pruning_dataset(ds, 2, num_proc=None)
    # num_proc=None on both sides: datasets forks a worker even at num_proc=1,
    # and os.fork() under an initialized (multithreaded) JAX risks deadlock.
    theirs = ref_trainer.filter_pruning_dataset(ds, 2, num_proc=None)
    assert ours.to_dict() == theirs.to_dict()

    ours = sample_items_by_label_priority(ds, 2, seed=13, num_proc=None)
    theirs = ref_trainer.sample_items_by_label_priority(ds, 2, seed=13, num_proc=None)
    assert ours.to_dict() == theirs.to_dict()

    ours = upsample_dataset(ds, 2.4, seed=7)
    theirs = ref_trainer.upsample_dataset(ds, 2.4, seed=7)
    assert ours.to_dict() == theirs.to_dict()

    for args in [(1000, 32, 2, 1.0, 1), (12345, 16, 4, 2.5, 1), (50, 8, 1, 1.0, 1)]:
        assert calculate_dynamic_steps(*args) == ref_trainer.calculate_dynamic_steps(*args)


# --- trainer smoke on the virtual mesh ---------------------------------------


def _tiny_training_setup(tmp_path, total_steps=6):
    import jax

    from open_provence_tpu.configs import (
        ModernBertBackboneConfig,
        OpenProvenceConfig,
    )
    from open_provence_tpu.models.model import build_module
    from open_provence_tpu.parallel.mesh import create_mesh
    from open_provence_tpu.train.collator import OpenProvenceDataCollator
    from open_provence_tpu.train.trainer import OpenProvenceTrainer

    backbone = ModernBertBackboneConfig(
        vocab_size=256, hidden_size=32, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64, local_attention=8,
        pad_token_id=0, num_labels=1,
    )
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(), num_labels=1,
        pruning_config={"hidden_size": 32, "classifier_dropout": 0.1},
        max_length=32,
    )
    module = build_module(config)
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    mesh = create_mesh()  # 8 virtual CPU devices on the data axis
    tokenizer = PairDummyTokenizer()
    collator = OpenProvenceDataCollator(
        tokenizer=tokenizer, max_length=32,
        scores_column="teacher_score",
        chunks_pos_column="context_spans",
        relevant_chunks_column="context_spans_relevance",
        pad_pairs_to=8,
    )
    trainer = OpenProvenceTrainer(
        config, params, tokenizer,
        output_dir=tmp_path,
        learning_rate=1e-3,
        total_steps=total_steps,
        bf16=False,
        mesh=mesh,
        attention_impl="xla",
    )
    return trainer, collator, mesh


def _train_batch(collator):
    feats = _features()
    # 4 real pairs, padded to 8 (divisible by the 8-device data axis).
    return collator(feats * 2)


@pytest.mark.slow
def test_gradient_accumulation_matches_full_batch(tmp_path):
    """accum=2 over two half-batches must reproduce accum=1 over their
    concatenation: same loss trajectory, same params (VERDICT r2 item 3).

    The two microbatches share the same mask/valid-count structure (same
    features, different teacher scores), so mean-of-means == global mean
    exactly and the trajectories agree to fp32 tolerance.
    """
    import jax

    from open_provence_tpu.configs import (
        ModernBertBackboneConfig,
        OpenProvenceConfig,
    )
    from open_provence_tpu.models.model import build_module
    from open_provence_tpu.parallel.mesh import create_mesh
    from open_provence_tpu.train.collator import OpenProvenceDataCollator
    from open_provence_tpu.train.trainer import OpenProvenceTrainer

    backbone = ModernBertBackboneConfig(
        vocab_size=256, hidden_size=32, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64, local_attention=8,
        pad_token_id=0, num_labels=1,
    )
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(), num_labels=1,
        # Dropout off: accumulation splits the rng per microbatch, so masks
        # would differ from the full-batch run and break exact equivalence.
        pruning_config={"hidden_size": 32, "classifier_dropout": 0.0},
        max_length=32,
    )
    module = build_module(config)
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    mesh = create_mesh()
    tokenizer = PairDummyTokenizer()
    collator = OpenProvenceDataCollator(
        tokenizer=tokenizer, max_length=32,
        scores_column="teacher_score",
        chunks_pos_column="context_spans",
        relevant_chunks_column="context_spans_relevance",
        pad_pairs_to=8,
    )

    mb1 = collator(_features() * 2)
    shifted = _features() * 2
    for row in shifted:
        row["teacher_score"] = [min(1.0, s + 0.05) for s in row["teacher_score"]]
    mb2 = collator(shifted)
    full = {k: np.concatenate([mb1[k], mb2[k]], axis=0) for k in mb1}

    def make(out_dir, accum):
        return OpenProvenceTrainer(
            config, jax.tree.map(np.copy, params), tokenizer,
            output_dir=out_dir,
            learning_rate=1e-3,
            total_steps=4,
            bf16=False,
            gradient_accumulation_steps=accum,
            mesh=mesh,
            attention_impl="xla",
        )

    t_full = make(tmp_path / "full", 1)
    t_acc = make(tmp_path / "acc", 2)
    for _ in range(3):
        m_full = t_full.train_one_step(full)
        m_acc = t_acc.train_one_step([mb1, mb2])
        assert m_acc["loss"] == pytest.approx(m_full["loss"], abs=2e-5)

    leaves_full = jax.tree.leaves(jax.device_get(t_full.state.params))
    leaves_acc = jax.tree.leaves(jax.device_get(t_acc.state.params))
    for a, b in zip(leaves_full, leaves_acc):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)

    # Misuse guards: wrong microbatch count / accum<1 must raise.
    with pytest.raises(ValueError):
        t_acc.train_one_step(mb1)
    with pytest.raises(ValueError):
        make(tmp_path / "bad", 0)


@pytest.mark.slow
def test_trainer_smoke_loss_decreases(tmp_path):
    import jax

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    trainer, collator, _mesh = _tiny_training_setup(tmp_path)
    batch = _train_batch(collator)
    losses = [trainer.train_one_step(batch)["loss"] for _ in range(6)]
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
    # Loss components tracked (reference last_loss_components).
    metrics = trainer.train_one_step(batch)
    assert "ranking_loss" in metrics and "pruning_loss" in metrics


@pytest.mark.slow
def test_trainer_owns_param_copies_and_deferred_sync(tmp_path):
    """The donated train step must never delete the CALLER's param arrays:
    two trainers built from the same (device-resident) params both step.
    Also covers sync=False: metrics come back as device arrays, fetchable
    after several streamed steps."""
    import jax
    import jax.numpy as jnp

    trainer, collator, mesh = _tiny_training_setup(tmp_path)
    batch = _train_batch(collator)
    # Device-resident params, as a caller converting a checkpoint would hold.
    shared = jax.tree.map(jnp.asarray, jax.device_get(trainer.state.params))

    from open_provence_tpu.train.trainer import OpenProvenceTrainer

    def make(out_dir):
        return OpenProvenceTrainer(
            trainer.config, shared, trainer.tokenizer,
            output_dir=out_dir, learning_rate=1e-3, total_steps=4,
            bf16=False, mesh=mesh, attention_impl="xla",
        )

    t1 = make(tmp_path / "one")
    t1.train_one_step(batch)  # donates t1's buffers — must not touch `shared`
    t2 = make(tmp_path / "two")  # would raise "Array has been deleted" pre-fix
    pending = [t2.train_one_step(batch, sync=False) for _ in range(3)]
    fetched = jax.device_get(pending)
    assert all(np.isfinite(float(m["loss"])) for m in fetched)
    # The shared tree itself is still alive.
    assert np.isfinite(float(np.sum(jax.device_get(jax.tree.leaves(shared)[0]))))


@pytest.mark.slow
def test_trainer_checkpoint_roundtrip(tmp_path):
    trainer, collator, _ = _tiny_training_setup(tmp_path)
    batch = _train_batch(collator)
    trainer.train_one_step(batch)
    trainer.train_one_step(batch)
    ckpt = trainer.save_checkpoint()
    assert (ckpt / "trainer_state.json").exists()
    assert (ckpt / "model.safetensors").exists()
    assert (ckpt / "config.json").exists()

    loss_before = trainer.train_one_step(batch)["loss"]
    step_before = trainer.state.step

    trainer2, _, _ = _tiny_training_setup(tmp_path / "second")
    trainer2.load_checkpoint(ckpt)
    assert trainer2.state.step == 2
    # Resumed optimizer state → identical next step.
    loss_resumed = trainer2.train_one_step(batch)["loss"]
    assert loss_resumed == pytest.approx(loss_before, rel=1e-5)
    assert trainer2.state.step == 3 and step_before == 3


@pytest.mark.slow
def test_trainer_resume_resolution(tmp_path):
    from open_provence_tpu.train.trainer import resolve_resume_checkpoint_path

    trainer, collator, _ = _tiny_training_setup(tmp_path)
    batch = _train_batch(collator)
    trainer.train_one_step(batch)
    trainer.save_checkpoint()
    trainer.train_one_step(batch)
    ckpt2 = trainer.save_checkpoint()

    resolved = resolve_resume_checkpoint_path(tmp_path)
    assert resolved.checkpoint_dir == ckpt2
    assert resolved.steps == 2
    resolved_direct = resolve_resume_checkpoint_path(ckpt2)
    assert resolved_direct.checkpoint_dir == ckpt2
    with pytest.raises(FileNotFoundError):
        resolve_resume_checkpoint_path(tmp_path / "nope")


@pytest.mark.slow
def test_trainer_export_reload_process(tmp_path):
    from open_provence_tpu.inference import OpenProvenceModel

    trainer, collator, _ = _tiny_training_setup(tmp_path)
    trainer.train_one_step(_train_batch(collator))
    export_dir = trainer.export_model(tmp_path / "final_model")
    model = OpenProvenceModel.from_pretrained(
        export_dir, tokenizer=PairDummyTokenizer(), attention_impl="xla", bucket_step=16
    )
    result = model.process("qq", "abc def. ghi jkl.", threshold=0.0, show_progress=False)
    assert result["pruned_context"] == "abc def. ghi jkl."


@pytest.mark.slow
def test_trainer_full_loop_with_eval(tmp_path):
    trainer, collator, _ = _tiny_training_setup(tmp_path, total_steps=4)

    def train_batches():
        for _ in range(4):
            yield _train_batch(collator)

    def eval_batches():
        yield _train_batch(collator)

    trainer.train(
        train_batches,
        total_steps=4,
        eval_batches=eval_batches,
        eval_steps=2,
        logging_steps=1,
        save_steps=2,
    )
    assert trainer.state.step >= 4
    eval_logs = [e for e in trainer.log_history if "eval_loss" in e]
    assert eval_logs, trainer.log_history
    assert trainer.best_checkpoint is not None
