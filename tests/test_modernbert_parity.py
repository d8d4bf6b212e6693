"""Numeric parity: JAX ModernBERT vs transformers eager ModernBERT (fp32).

The published OpenProvence checkpoints are ModernBERT backbones executed via
``transformers`` (reference encoder.py:128-144). This test builds a tiny
randomly-initialized HF model offline, converts its weights with
utils/hf_convert.py, and asserts that ranking logits, pre-final-norm hidden
states, and pruning logits agree to fp32 tolerance — covering rotary (dual
theta), sliding-window masking, GeGLU, layer-0 Identity norm, padding masks,
and the cls-pooled classification head.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
enable_x64 = jax.enable_x64  # noqa: E402

from open_provence_tpu.configs import (  # noqa: E402
    ModernBertBackboneConfig,
    OpenProvenceConfig,
    PruningHeadConfig,
)
from open_provence_tpu.models.model import OpenProvenceModule  # noqa: E402
from open_provence_tpu.utils.hf_convert import (  # noqa: E402
    detect_architecture,
    hf_to_flax_params,
    flax_params_to_hf,
    normalize_state_dict,
)

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=4,
    num_attention_heads=4,
    max_position_embeddings=64,
    local_attention=8,
    global_attn_every_n_layers=3,
    global_rope_theta=160000.0,
    local_rope_theta=10000.0,
    pad_token_id=0,
    bos_token_id=1,
    eos_token_id=2,
    cls_token_id=1,
    sep_token_id=2,
    num_labels=1,
)


def _build_hf_model(num_labels=1, classifier_pooling="cls"):
    cfg = transformers.ModernBertConfig(
        **{**TINY, "num_labels": num_labels},
        classifier_pooling=classifier_pooling,
        attn_implementation="eager",
        reference_compile=False,
    )
    torch.manual_seed(0)
    model = transformers.ModernBertForSequenceClassification(cfg)
    model.eval()
    return model, cfg


def _merged_state_dict(hf_model, pruning_head):
    sd = {f"ranking_model.{k}": v for k, v in hf_model.state_dict().items()}
    sd.update({f"pruning_head.{k}": v for k, v in pruning_head.state_dict().items()})
    return sd


class TorchPruningHead(torch.nn.Module):
    def __init__(self, hidden_size, num_labels=2):
        super().__init__()
        self.classifier = torch.nn.Linear(hidden_size, num_labels)

    def forward(self, hidden_states):
        return self.classifier(hidden_states)


def _op_config(num_labels=1):
    backbone = ModernBertBackboneConfig(**{**TINY, "num_labels": num_labels})
    return OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=num_labels,
        pruning_config={"hidden_size": TINY["hidden_size"], "classifier_dropout": 0.0},
        max_length=64,
    )


@pytest.mark.parametrize("num_labels", [1, 2])
def test_forward_parity(num_labels):
    """Strict float64 parity on unpadded batches.

    Padding is excluded here because HF itself NaNs under f64 + padding (its
    fp32-softmax downcast turns f64-min mask fills into -inf and fully-masked
    sliding-window rows become NaN); padded-batch correctness is covered by
    test_padding_invariance instead.
    """
    hf_model, _hf_cfg = _build_hf_model(num_labels=num_labels)
    hf_model = hf_model.double()
    torch.manual_seed(1)
    pruning_head = TorchPruningHead(TINY["hidden_size"]).double().eval()

    config = _op_config(num_labels=num_labels)
    module = OpenProvenceModule(
        backbone_config=config.backbone(), pruning_config=config.pruning_head()
    )

    rng = np.random.default_rng(0)
    batch, seq = 3, 24
    input_ids = rng.integers(3, TINY["vocab_size"], size=(batch, seq))
    attention_mask = np.ones((batch, seq), dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            output_hidden_states=True,
        )
        hf_hidden_pre_norm = hf_out.hidden_states[-1]
        hf_pruning = pruning_head(hf_hidden_pre_norm)

    with enable_x64():
        sd64 = {
            k: v.detach().numpy().astype(np.float64)
            for k, v in _merged_state_dict(hf_model, pruning_head).items()
        }
        params = hf_to_flax_params(sd64, config)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float64), params)
        apply = jax.jit(
            lambda p, ids, mask: module.apply(
                {"params": p}, ids, mask, deterministic=True, attention_impl="xla"
            )
        )
        out = apply(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))
        ranking = np.asarray(out["ranking_logits"])
        pre_norm = np.asarray(out["last_hidden_pre_norm"])
        pruning = np.asarray(out["pruning_logits"])

    # Both sides intentionally run softmax and rope tables in fp32 (matching
    # the numerics the published checkpoints were evaluated with), so the
    # float64 comparison still carries ~1e-7 fp32 rounding noise.
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(ranking, hf_out.logits.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        pre_norm[valid], hf_hidden_pre_norm.numpy()[valid], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        pruning[valid], hf_pruning.numpy()[valid], atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_padding_invariance():
    """Padded-batch outputs at valid positions must equal per-row unpadded
    outputs — the property the inference engine's bucketed padding relies on."""
    hf_model, _ = _build_hf_model(num_labels=1)
    torch.manual_seed(1)
    pruning_head = TorchPruningHead(TINY["hidden_size"]).eval()
    config = _op_config(num_labels=1)
    module = OpenProvenceModule(
        backbone_config=config.backbone(), pruning_config=config.pruning_head()
    )

    with enable_x64():
        sd64 = {
            k: v.detach().numpy().astype(np.float64)
            for k, v in _merged_state_dict(hf_model, pruning_head).items()
        }
        params = hf_to_flax_params(sd64, config)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float64), params)

        rng = np.random.default_rng(7)
        seq = 24
        lengths = [24, 18, 10]
        input_ids = rng.integers(3, TINY["vocab_size"], size=(3, seq))
        attention_mask = np.zeros((3, seq), dtype=np.int64)
        for row, n in enumerate(lengths):
            attention_mask[row, :n] = 1
            input_ids[row, n:] = TINY["pad_token_id"]

        padded = module.apply(
            {"params": params},
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            attention_impl="xla",
        )
        for row, n in enumerate(lengths):
            single = module.apply(
                {"params": params},
                jnp.asarray(input_ids[row : row + 1, :n]),
                jnp.ones((1, n), dtype=jnp.int32),
                attention_impl="xla",
            )
            np.testing.assert_allclose(
                np.asarray(padded["ranking_logits"])[row],
                np.asarray(single["ranking_logits"])[0],
                atol=1e-12,
            )
            np.testing.assert_allclose(
                np.asarray(padded["pruning_logits"])[row, :n],
                np.asarray(single["pruning_logits"])[0],
                atol=1e-12,
            )


def test_mean_pooling_parity():
    hf_model, _ = _build_hf_model(num_labels=1, classifier_pooling="mean")
    hf_model = hf_model.double()
    torch.manual_seed(1)
    pruning_head = TorchPruningHead(TINY["hidden_size"]).double().eval()

    backbone = ModernBertBackboneConfig(**TINY, classifier_pooling="mean")
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": TINY["hidden_size"], "classifier_dropout": 0.0},
    )
    module = OpenProvenceModule(
        backbone_config=config.backbone(), pruning_config=config.pruning_head()
    )

    rng = np.random.default_rng(3)
    input_ids = rng.integers(3, TINY["vocab_size"], size=(2, 16))
    attention_mask = np.ones((2, 16), dtype=np.int64)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    with enable_x64():
        sd64 = {
            k: v.detach().numpy().astype(np.float64)
            for k, v in _merged_state_dict(hf_model, pruning_head).items()
        }
        params = hf_to_flax_params(sd64, config)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float64), params)
        out = module.apply(
            {"params": params},
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            attention_impl="xla",
        )
        logits = np.asarray(out["ranking_logits"])
    np.testing.assert_allclose(logits, hf_logits, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_long_context_parity_crossing_window_boundary():
    """S=1024 ≫ local_attention=128 with max_position_embeddings=8192: the
    sliding-window band (±64) and the dual-theta rope tables past position
    512 must match HF eager — the semantics the 8192-token opportunity
    (SURVEY §5.7) rests on, exercised beyond kernel unit tests."""
    long_cfg = {
        **TINY,
        "max_position_embeddings": 8192,
        "local_attention": 128,
        "num_hidden_layers": 4,  # layers 0,3 global / 1,2 local
    }
    cfg = transformers.ModernBertConfig(
        **long_cfg,
        classifier_pooling="cls",
        attn_implementation="eager",
        reference_compile=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.ModernBertForSequenceClassification(cfg).double().eval()
    torch.manual_seed(1)
    pruning_head = TorchPruningHead(TINY["hidden_size"]).double().eval()

    backbone = ModernBertBackboneConfig(**long_cfg)
    config = OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": TINY["hidden_size"], "classifier_dropout": 0.0},
        max_length=8192,
    )
    module = OpenProvenceModule(
        backbone_config=config.backbone(), pruning_config=config.pruning_head()
    )

    rng = np.random.default_rng(11)
    batch, seq = 1, 1024
    input_ids = rng.integers(3, TINY["vocab_size"], size=(batch, seq))
    attention_mask = np.ones((batch, seq), dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            output_hidden_states=True,
        )
        hf_pre_norm = hf_out.hidden_states[-1]
        hf_pruning = pruning_head(hf_pre_norm)

    with enable_x64():
        sd64 = {
            k: v.detach().numpy().astype(np.float64)
            for k, v in _merged_state_dict(hf_model, pruning_head).items()
        }
        params = hf_to_flax_params(sd64, config)
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float64), params)
        out = module.apply(
            {"params": params},
            jnp.asarray(input_ids),
            jnp.asarray(attention_mask),
            deterministic=True,
            attention_impl="xla",
        )

    np.testing.assert_allclose(
        np.asarray(out["ranking_logits"]), hf_out.logits.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_pre_norm"]),
        hf_pre_norm.numpy(),
        atol=1e-5,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["pruning_logits"]), hf_pruning.numpy(), atol=1e-5, rtol=1e-5
    )


def test_roundtrip_export():
    hf_model, _ = _build_hf_model()
    torch.manual_seed(1)
    pruning_head = TorchPruningHead(TINY["hidden_size"]).eval()
    config = _op_config()
    merged = _merged_state_dict(hf_model, pruning_head)
    params = hf_to_flax_params(merged, config)
    exported = flax_params_to_hf(params, config)
    for key, value in merged.items():
        assert key in exported, f"missing {key} in export"
        np.testing.assert_allclose(
            exported[key], value.numpy(), atol=0, rtol=0, err_msg=key
        )


def test_legacy_prefix_normalization():
    hf_model, _ = _build_hf_model()
    torch.manual_seed(1)
    pruning_head = TorchPruningHead(TINY["hidden_size"]).eval()
    merged = _merged_state_dict(hf_model, pruning_head)

    # Legacy layout: strip ranking_model. prefix entirely.
    legacy = {
        (k[len("ranking_model."):] if k.startswith("ranking_model.") else k): v
        for k, v in merged.items()
    }
    normalized = normalize_state_dict(legacy)
    assert set(normalized) == set(merged)

    # Flat ModernBERT layout: also strip the inner model. prefix.
    flat = {}
    for k, v in legacy.items():
        if k.startswith("model."):
            flat[k[len("model."):]] = v
        else:
            flat[k] = v
    normalized_flat = normalize_state_dict(flat)
    assert set(normalized_flat) == set(merged)


def test_detect_architecture():
    hf_model, _ = _build_hf_model()
    keys = list(hf_model.state_dict().keys())
    assert detect_architecture(keys) == "modernbert"
    assert detect_architecture(["bert.embeddings.word_embeddings.weight",
                                "bert.encoder.layer.0.x", "bert.LayerNorm.weight"]) == "bert"
    assert detect_architecture(["foo.bar"]) == "unknown"
