"""Pallas kernels under GSPMD sharding (VERDICT r2 item 4).

The engine and trainer shard batches over the mesh data axis and jit the
model with the Pallas kernels engaged; on real hardware that combination is
only ever exercised single-chip. These tests run the SAME kernel code paths
(packed flash attention, fused GeGLU, fused LN, LN-folded Wqkv matmul) on
the 8-virtual-device CPU mesh via ``pallas_call(interpret=True)``
(OPEN_PROVENCE_TPU_PALLAS_INTERPRET=1), asserting equality with the
unsharded XLA path — so a per-shard block-divisibility break or a
partitioning regression fails here instead of on a pod.
"""

from __future__ import annotations

import numpy as np
import pytest

# 8-device-mesh integration tests: heavy jit compiles, excluded from the
# default fast suite (run with `pytest -m slow`).
pytestmark = pytest.mark.slow

# Shapes chosen to satisfy every kernel gate: hidden % 128 == 0,
# head_dim == 64 with an even head count (packed flash), intermediate % 64,
# seq % 128, and per-shard rows % 8 on the 8-device mesh.
_HIDDEN = 128
_HEADS = 2
_INTERMEDIATE = 192
_SEQ = 256
_BATCH = 16


@pytest.fixture
def pallas_interpret_env(monkeypatch):
    monkeypatch.setenv("OPEN_PROVENCE_TPU_PALLAS_INTERPRET", "1")


def _tiny_config():
    from open_provence_tpu.configs import (
        ModernBertBackboneConfig,
        OpenProvenceConfig,
    )

    backbone = ModernBertBackboneConfig(
        vocab_size=512,
        hidden_size=_HIDDEN,
        intermediate_size=_INTERMEDIATE,
        num_hidden_layers=2,
        num_attention_heads=_HEADS,
        max_position_embeddings=_SEQ,
        local_attention=64,
        pad_token_id=0,
        num_labels=1,
    )
    return OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": _HIDDEN, "classifier_dropout": 0.0},
        max_length=_SEQ,
    )


def _inputs():
    rng = np.random.default_rng(7)
    input_ids = rng.integers(1, 500, size=(_BATCH, _SEQ), dtype=np.int32)
    attention_mask = np.ones((_BATCH, _SEQ), dtype=np.int32)
    # Ragged valid lengths so padding masking is exercised per shard.
    for row in range(_BATCH):
        valid = _SEQ - (row % 4) * 16
        attention_mask[row, valid:] = 0
        input_ids[row, valid:] = 0
    return input_ids, attention_mask


def _build(config):
    import jax

    from open_provence_tpu.models.model import build_module

    module = build_module(config)
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, _SEQ), dtype=np.int32),
        np.ones((1, _SEQ), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    return module, params


def _data_sharded(mesh, *arrays):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data", None))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def test_pallas_forward_sharded_matches_xla_unsharded(pallas_interpret_env):
    import jax

    from open_provence_tpu.models.modernbert import mlp_geglu_fusable
    from open_provence_tpu.ops.attention import use_packed_flash
    from open_provence_tpu.parallel.mesh import create_mesh

    # Preconditions: the kernels must actually engage for these shapes.
    config = _tiny_config()
    assert use_packed_flash("auto", _BATCH, _SEQ, _HEADS, _HIDDEN // _HEADS)
    assert mlp_geglu_fusable(config.backbone(), _BATCH * _SEQ, np.float32)

    module, params = _build(config)
    input_ids, attention_mask = _inputs()

    ref = module.apply(
        {"params": params},
        input_ids,
        attention_mask,
        deterministic=True,
        attention_impl="xla",
    )

    mesh = create_mesh()  # 8 virtual CPU devices on the data axis
    ids_sh, mask_sh = _data_sharded(mesh, input_ids, attention_mask)
    fn = jax.jit(
        lambda p, i, m: module.apply(
            {"params": p}, i, m, deterministic=True, attention_impl="pallas"
        )
    )
    with mesh:
        out = fn(params, ids_sh, mask_sh)
        out = jax.device_get(out)

    np.testing.assert_allclose(
        np.asarray(out["ranking_logits"]),
        np.asarray(ref["ranking_logits"]),
        atol=5e-4,
        rtol=5e-4,
    )
    # Pruning logits only matter where attention_mask is 1.
    mask = attention_mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out["pruning_logits"])[mask],
        np.asarray(ref["pruning_logits"])[mask],
        atol=5e-4,
        rtol=5e-4,
    )


def test_pallas_backward_sharded_matches_xla(pallas_interpret_env):
    """Gradients through the Pallas custom-vjp kernels (flash backward,
    fused GeGLU backward, LN-matmul backward) under the sharded jit."""
    import jax
    import jax.numpy as jnp

    from open_provence_tpu.parallel.mesh import create_mesh

    config = _tiny_config()
    module, params = _build(config)
    input_ids, attention_mask = _inputs()

    def loss(p, ids, mask, impl):
        out = module.apply(
            {"params": p}, ids, mask, deterministic=True, attention_impl=impl
        )
        mask_f = mask.astype(jnp.float32)
        pruning = (out["pruning_logits"][..., 0] * mask_f).sum() / mask_f.sum()
        return out["ranking_logits"].mean() + pruning

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: loss(p, input_ids, attention_mask, "xla")
    )(params)

    mesh = create_mesh()
    ids_sh, mask_sh = _data_sharded(mesh, input_ids, attention_mask)
    grad_fn = jax.jit(
        jax.value_and_grad(lambda p, i, m: loss(p, i, m, "pallas"))
    )
    with mesh:
        out_loss, out_grads = jax.device_get(grad_fn(params, ids_sh, mask_sh))

    assert float(out_loss) == pytest.approx(float(ref_loss), abs=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(jax.device_get(ref_grads))
    flat_out = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(out_grads)
    )
    checked = 0
    for key, ref_leaf in flat_ref:
        out_leaf = flat_out[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(out_leaf), np.asarray(ref_leaf), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(key),
        )
        checked += 1
    assert checked > 10
