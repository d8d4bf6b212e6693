"""AutoModel-surface wrapper tests (models/hf_wrappers.py).

Loss paths are golden-tested against torch's BCEWithLogitsLoss /
CrossEntropyLoss, which is what the reference wrappers use
(modeling_open_provence_standalone.py:1707-1716, 3852-3881).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_provence_tpu.configs import ModernBertBackboneConfig, OpenProvenceConfig
from open_provence_tpu.models.hf_wrappers import (
    AUTO_MAP,
    OpenProvenceForSequenceClassification,
    OpenProvenceForTokenClassification,
)
from open_provence_tpu.models.model import OpenProvenceModule

VOCAB = 128


def _tiny(num_labels=1):
    backbone = ModernBertBackboneConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=64,
        local_attention=16,
        global_attn_every_n_layers=3,
        pad_token_id=0,
        num_labels=num_labels,
    )
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=num_labels,
        pruning_config={"hidden_size": 32, "classifier_dropout": 0.0},
        max_length=64,
    )
    module = OpenProvenceModule(
        backbone_config=config.backbone(), pruning_config=config.pruning_head()
    )
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    return config, params


@pytest.fixture(scope="module")
def tiny1():
    return _tiny(num_labels=1)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    ids = rng.integers(4, VOCAB, size=(3, 12)).astype(np.int32)
    mask = np.ones((3, 12), dtype=np.int32)
    mask[1, 8:] = 0
    mask[2, 5:] = 0
    return ids, mask


def test_seq_cls_logits_and_fields(tiny1, batch):
    config, params = tiny1
    model = OpenProvenceForSequenceClassification(config, params, attention_impl="xla")
    ids, mask = batch
    out = model(ids, mask)
    assert out.loss is None
    assert out.logits.shape == (3, 1)
    assert out.pruning_logits.shape == (3, 12, 2)
    np.testing.assert_array_equal(np.asarray(out.logits), np.asarray(out.ranking_logits))
    # tuple mode mirrors the reference's return_dict=False contract
    tup = model(ids, mask, return_dict=False)
    assert isinstance(tup, tuple) and len(tup) == 2


def test_seq_cls_bce_loss_matches_torch(tiny1, batch):
    torch = pytest.importorskip("torch")
    config, params = tiny1
    model = OpenProvenceForSequenceClassification(config, params, attention_impl="xla")
    ids, mask = batch
    labels = np.array([1.0, 0.0, 1.0], dtype=np.float32)
    out = model(ids, mask, labels=labels)
    logits = torch.tensor(np.asarray(out.logits, dtype=np.float32))
    want = torch.nn.BCEWithLogitsLoss()(logits.view(-1), torch.tensor(labels))
    np.testing.assert_allclose(float(out.loss), float(want), rtol=1e-5)


def test_seq_cls_ce_loss_matches_torch(batch):
    torch = pytest.importorskip("torch")
    config, params = _tiny(num_labels=2)
    model = OpenProvenceForSequenceClassification(config, params, attention_impl="xla")
    ids, mask = batch
    labels = np.array([1, 0, 1], dtype=np.int32)
    out = model(ids, mask, labels=labels)
    logits = torch.tensor(np.asarray(out.logits, dtype=np.float32))
    want = torch.nn.CrossEntropyLoss()(logits.view(-1, 2), torch.tensor(labels, dtype=torch.long))
    np.testing.assert_allclose(float(out.loss), float(want), rtol=1e-5)


def test_token_cls_masked_ce_matches_torch(tiny1, batch):
    torch = pytest.importorskip("torch")
    config, params = tiny1
    model = OpenProvenceForTokenClassification(config, params, attention_impl="xla")
    ids, mask = batch
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 2, size=ids.shape).astype(np.int32)
    labels[0, :2] = -100  # ignored inside the active region too
    out = model(ids, mask, labels=labels)
    assert out.logits.shape == (3, 12, 2)

    logits_t = torch.tensor(np.asarray(out.logits, dtype=np.float32))
    active = torch.tensor(mask).view(-1) == 1
    want = torch.nn.CrossEntropyLoss()(
        logits_t.view(-1, 2)[active],
        torch.tensor(labels, dtype=torch.long).view(-1)[active],
    )
    np.testing.assert_allclose(float(out.loss), float(want), rtol=1e-5)


def test_token_cls_no_active_positions_zero_loss(tiny1):
    config, params = tiny1
    model = OpenProvenceForTokenClassification(config, params, attention_impl="xla")
    ids = np.full((1, 8), 4, dtype=np.int32)
    mask = np.zeros((1, 8), dtype=np.int32)
    labels = np.ones((1, 8), dtype=np.int32)
    out = model(ids, mask, labels=labels)
    assert float(out.loss) == 0.0


def test_token_cls_matches_base_forward(tiny1, batch):
    config, params = tiny1
    seq = OpenProvenceForSequenceClassification(config, params, attention_impl="xla")
    tok = OpenProvenceForTokenClassification(config, params, attention_impl="xla")
    ids, mask = batch
    np.testing.assert_allclose(
        np.asarray(seq(ids, mask).pruning_logits, dtype=np.float32),
        np.asarray(tok(ids, mask).logits, dtype=np.float32),
        rtol=1e-5,
    )


def test_from_pretrained_and_auto_map(tmp_path, tiny1):
    from open_provence_tpu.encoder import OpenProvenceEncoder
    from tests.dummy_tokenizers import DummyTokenizer

    config, params = tiny1
    enc = OpenProvenceEncoder(
        None, config=config, params=params, tokenizer=DummyTokenizer(),
        attention_impl="xla",
    )
    out_dir = enc.save_pretrained(tmp_path / "ckpt")

    import json

    cfg = json.loads((out_dir / "config.json").read_text())
    assert cfg["auto_map"] == AUTO_MAP
    assert cfg["architectures"] == ["OpenProvenceForSequenceClassification"]

    model = OpenProvenceForSequenceClassification.from_pretrained(
        out_dir, attention_impl="xla"
    )
    ids = np.full((1, 8), 4, dtype=np.int32)
    direct = OpenProvenceForSequenceClassification(config, params, attention_impl="xla")
    np.testing.assert_allclose(
        np.asarray(model(ids).logits, dtype=np.float32),
        np.asarray(direct(ids).logits, dtype=np.float32),
        atol=1e-5,
    )
