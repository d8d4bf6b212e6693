"""Tensor-parallel numerics: tp=2/dp=4 must match tp=1/dp=8.

The reference trains single-GPU (reference trainer.py:1509-1515) — TP is new
first-class surface here (SURVEY §2.4), so its correctness gate is internal
consistency: identical losses, gradients, and parameter trajectories whether
the model axis is used or not. GSPMD sharding is layout, not math; any
divergence beyond fp32 reduction-order noise is a bug in
``parallel/mesh.py::param_sharding_rules``.
"""

import numpy as np
import pytest

# 8-device-mesh integration tests: heavy jit compiles, excluded from the
# default fast suite (run with `pytest -m slow`).
pytestmark = pytest.mark.slow

from tests.dummy_tokenizers import PairDummyTokenizer


def _tp_config():
    from open_provence_tpu.configs import (
        ModernBertBackboneConfig,
        OpenProvenceConfig,
    )

    backbone = ModernBertBackboneConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=64,
        local_attention=8,
        pad_token_id=0,
        num_labels=1,
    )
    # Zero dropout everywhere: the two meshes draw dropout masks over
    # differently-sharded activations, so stochastic paths are excluded from
    # the equivalence claim.
    return OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": 64, "classifier_dropout": 0.0},
        max_length=32,
    )


def _init_params(config):
    import jax

    from open_provence_tpu.models.model import build_module

    module = build_module(config)
    return module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]


def _make_trainer(config, params, mesh, tensor_parallel, tmp_path, tag):
    from open_provence_tpu.train.trainer import OpenProvenceTrainer

    return OpenProvenceTrainer(
        config,
        params,
        PairDummyTokenizer(),
        output_dir=tmp_path / tag,
        learning_rate=1e-3,
        total_steps=8,
        bf16=False,
        mesh=mesh,
        tensor_parallel=tensor_parallel,
        attention_impl="xla",
        seed=42,
    )


def _batch(pairs=8, seq=32, seed=3):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=(pairs, seq))
    labels[:, :3] = -100
    return {
        "input_ids": rng.integers(4, 250, size=(pairs, seq)).astype(np.int32),
        "attention_mask": np.ones((pairs, seq), dtype=np.int32),
        "pruning_labels": labels.astype(np.int64),
        "ranking_targets": rng.uniform(size=(pairs,)).astype(np.float32),
        "pair_mask": np.ones((pairs,), dtype=np.float32),
        "batch_indices": np.arange(pairs, dtype=np.int32),
        "doc_indices": np.zeros((pairs,), dtype=np.int32),
    }


def _grads(trainer, batch):
    import jax

    def loss_fn(p):
        total, _ = trainer._loss_for_batch(
            p, trainer._prepare_batch(batch), None, True
        )
        return total

    with trainer.mesh:
        loss, grads = jax.value_and_grad(loss_fn)(trainer.state.params)
    return float(loss), jax.device_get(grads)


def test_tp_matches_dp_grads_and_training(tmp_path):
    import jax

    assert len(jax.devices()) == 8

    from open_provence_tpu.parallel.mesh import create_mesh

    config = _tp_config()
    params = _init_params(config)

    mesh_dp = create_mesh(data=8, model=1)
    mesh_tp = create_mesh(data=4, model=2)
    # Host copies: device_put can alias shards of the source array, and the
    # donated train steps would then delete buffers out from under the other
    # trainer.
    host = jax.tree.map(np.asarray, params)
    t_dp = _make_trainer(config, jax.tree.map(np.copy, host), mesh_dp, False, tmp_path, "dp")
    t_tp = _make_trainer(config, jax.tree.map(np.copy, host), mesh_tp, True, tmp_path, "tp")

    # TP sharding must actually shard: Wqkv kernel lives on 2 model shards.
    wqkv = t_tp.state.params["ranking_model"]["model"]["layers_1"]["attn"]["Wqkv"][
        "kernel"
    ]
    assert not wqkv.sharding.is_fully_replicated
    assert t_dp.state.params["ranking_model"]["model"]["layers_1"]["attn"]["Wqkv"][
        "kernel"
    ].sharding.is_fully_replicated

    batch = _batch()
    loss_dp, grads_dp = _grads(t_dp, batch)
    loss_tp, grads_tp = _grads(t_tp, batch)
    assert loss_dp == pytest.approx(loss_tp, rel=1e-5)

    flat_dp = jax.tree_util.tree_leaves_with_path(grads_dp)
    flat_tp = {
        jax.tree_util.keystr(path): leaf
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads_tp)
    }
    assert len(flat_dp) == len(flat_tp)
    for path, leaf_dp in flat_dp:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf_dp),
            np.asarray(flat_tp[key]),
            rtol=1e-4,
            atol=1e-6,
            err_msg=f"gradient mismatch at {key}",
        )

    # Three full optimizer steps on identical batches: loss trajectories and
    # final parameters must agree within fp32 reduction-order tolerance.
    for step in range(3):
        step_batch = _batch(seed=10 + step)
        m_dp = t_dp.train_one_step(step_batch)
        m_tp = t_tp.train_one_step(step_batch)
        assert m_dp["loss"] == pytest.approx(m_tp["loss"], rel=1e-4), (
            step,
            m_dp,
            m_tp,
        )

    final_dp = jax.device_get(t_dp.state.params)
    final_tp = jax.device_get(t_tp.state.params)
    for path, leaf_dp in jax.tree_util.tree_leaves_with_path(final_dp):
        key = jax.tree_util.keystr(path)
        leaf_tp = final_tp
        for k in path:
            leaf_tp = leaf_tp[k.key]
        np.testing.assert_allclose(
            np.asarray(leaf_dp),
            np.asarray(leaf_tp),
            rtol=1e-3,
            atol=1e-5,
            err_msg=f"param mismatch after 3 steps at {key}",
        )


def test_tp_real_dims_two_steps(tmp_path):
    """TP on the 4x2 mesh at the BASE model's per-layer dims (12 heads x
    head_dim 64, hidden 768, intermediate 1152, S=512) — the tiny-shape dryrun
    proves mesh wiring but not the real column-shard of 12 heads across tp=2
    (VERDICT r4 weak #6). 3 layers = one global + two local, covering both
    attention flavors; tiny vocab keeps the embedding table CPU-affordable."""
    import jax

    assert len(jax.devices()) == 8

    from open_provence_tpu.configs import (
        ModernBertBackboneConfig,
        OpenProvenceConfig,
    )
    from open_provence_tpu.parallel.mesh import create_mesh

    backbone = ModernBertBackboneConfig(
        vocab_size=512,
        num_hidden_layers=3,
        max_position_embeddings=512,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        cls_token_id=1,
        sep_token_id=2,
        num_labels=1,
    )
    assert backbone.hidden_size == 768 and backbone.num_attention_heads == 12
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": 768, "classifier_dropout": 0.0},
        max_length=512,
    )
    params = _init_params(config)
    mesh = create_mesh(data=4, model=2)
    trainer = _make_trainer(config, params, mesh, True, tmp_path, "tp_real")

    # The TP PartitionSpecs actually land on the real-dim kernels: Wqkv and
    # Wi column-sharded, Wo row-sharded over the model axis.
    layer = trainer.state.params["ranking_model"]["model"]["layers_1"]
    for name, kernel in (
        ("attn.Wqkv", layer["attn"]["Wqkv"]["kernel"]),
        ("mlp.Wi", layer["mlp"]["Wi"]["kernel"]),
        ("attn.Wo", layer["attn"]["Wo"]["kernel"]),
        ("mlp.Wo", layer["mlp"]["Wo"]["kernel"]),
    ):
        assert not kernel.sharding.is_fully_replicated, name
        assert "model" in jax.tree_util.tree_leaves(
            [axis for axis in kernel.sharding.spec if axis is not None]
        ), (name, kernel.sharding.spec)

    rng = np.random.default_rng(11)
    losses = []
    for step in range(2):
        pairs, seq = 8, 512
        labels = rng.integers(0, 2, size=(pairs, seq))
        labels[:, :5] = -100
        batch = {
            "input_ids": rng.integers(4, 500, size=(pairs, seq)).astype(np.int32),
            "attention_mask": np.ones((pairs, seq), dtype=np.int32),
            "pruning_labels": labels.astype(np.int64),
            "ranking_targets": rng.uniform(size=(pairs,)).astype(np.float32),
            "pair_mask": np.ones((pairs,), dtype=np.float32),
            "batch_indices": np.arange(pairs, dtype=np.int32),
            "doc_indices": np.zeros((pairs,), dtype=np.int32),
        }
        metrics = trainer.train_one_step(batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses


def _wqkv_kernel(params):
    return params["ranking_model"]["model"]["layers_1"]["attn"]["Wqkv"]["kernel"]


def test_tp_resume_preserves_sharding_and_trajectory(tmp_path):
    """Checkpoint + resume under tensor_parallel=True must (a) restore params
    with the TP PartitionSpecs (load_checkpoint used to re-place everything
    replicated, silently dropping the model-axis sharding) and (b) reproduce
    the uninterrupted run's parameter trajectory exactly."""
    import jax

    assert len(jax.devices()) == 8

    from open_provence_tpu.parallel.mesh import create_mesh

    config = _tp_config()
    params = _init_params(config)
    host = jax.tree.map(np.asarray, params)

    mesh = create_mesh(data=4, model=2)
    t_ref = _make_trainer(config, jax.tree.map(np.copy, host), mesh, True, tmp_path, "ref")
    t_a = _make_trainer(config, jax.tree.map(np.copy, host), mesh, True, tmp_path, "a")

    for step in range(2):
        batch = _batch(seed=20 + step)
        t_ref.train_one_step(batch)
        t_a.train_one_step(batch)
    ckpt_dir = t_a.save_checkpoint()

    # Fresh trainer with DIFFERENT init params (PRNGKey 7): everything must
    # come from the checkpoint.
    from open_provence_tpu.models.model import build_module

    module = build_module(config)
    fresh = module.init(
        jax.random.PRNGKey(7),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    t_b = _make_trainer(config, fresh, mesh, True, tmp_path, "b")
    t_b.load_checkpoint(ckpt_dir)

    # (a) restored params keep the TP layout.
    restored_wqkv = _wqkv_kernel(t_b.state.params)
    assert not restored_wqkv.sharding.is_fully_replicated
    assert restored_wqkv.sharding.spec == _wqkv_kernel(t_ref.state.params).sharding.spec
    assert t_b.state.step == 2

    # (b) two more identical steps: resumed run tracks the uninterrupted one.
    for step in range(2):
        batch = _batch(seed=40 + step)
        m_ref = t_ref.train_one_step(batch)
        m_b = t_b.train_one_step(batch)
        assert m_ref["loss"] == pytest.approx(m_b["loss"], rel=1e-6), step

    final_ref = jax.device_get(t_ref.state.params)
    final_b = jax.device_get(t_b.state.params)
    for path, leaf_ref in jax.tree_util.tree_leaves_with_path(final_ref):
        key = jax.tree_util.keystr(path)
        leaf_b = final_b
        for k in path:
            leaf_b = leaf_b[k.key]
        np.testing.assert_allclose(
            np.asarray(leaf_ref),
            np.asarray(leaf_b),
            rtol=1e-6,
            atol=1e-7,
            err_msg=f"resumed trajectory diverged at {key}",
        )
