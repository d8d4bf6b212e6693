"""Checkpoint-layout validation for the four published model families
(VERDICT r3 #4).

The published checkpoints (reference README.md:28-33) are not fetchable
offline, so each family's state dict is synthesized by instantiating the
reference's own torch OpenProvenceModel with that family's architecture
config — exact layer counts, head counts, norm_bias, and classifier_pooling;
widths shrunk for the 1-core host (key INVENTORY does not depend on width):

* xsmall (30M, japanese-reranker-xsmall-v2 backbone): 10 layers, 4 heads
* base (130M, japanese-reranker-base-v2): 19 layers, 8 heads
* large (310M, ruri-v3-reranker-310m): 25 layers, 12 heads
* en-gte (149M, gte-reranker-modernbert-base = ModernBERT-base): 22 layers,
  12 heads, classifier_pooling "mean"
* plus a norm_bias=True variant (reference utils/model_architecture.py
  documents bias-carrying layouts)

Each family: exact key-inventory assertions, hf→flax conversion, forward
logit parity vs the reference torch model, flax→hf export round-trip with
key-set equality, and a convert_checkpoint.py CLI pass.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = (REFERENCE_ROOT / "open_provence").exists()
REPO_ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")

# Family structure: exact depth/heads/pooling/biases of the published
# checkpoints; hidden/intermediate/vocab shrunk (head_dim 16) so all four
# torch models build in seconds on CPU.
FAMILIES = {
    "xsmall": dict(layers=10, heads=4, pooling="cls", norm_bias=False),
    "base": dict(layers=19, heads=8, pooling="cls", norm_bias=False),
    "large": dict(layers=25, heads=12, pooling="cls", norm_bias=False),
    "en-gte": dict(layers=22, heads=12, pooling="mean", norm_bias=False),
    "norm-bias-variant": dict(layers=4, heads=4, pooling="cls", norm_bias=True),
}


def _family_backbone(spec: dict) -> dict:
    hidden = spec["heads"] * 16
    return {
        "model_type": "modernbert",
        "vocab_size": 1024,
        "hidden_size": hidden,
        "intermediate_size": hidden * 3 // 2,
        "num_hidden_layers": spec["layers"],
        "num_attention_heads": spec["heads"],
        "max_position_embeddings": 256,
        "local_attention": 32,
        "global_attn_every_n_layers": 3,
        "norm_eps": 1e-5,
        "norm_bias": spec["norm_bias"],
        "classifier_pooling": spec["pooling"],
        "pad_token_id": 0,
        "cls_token_id": 2,
        "sep_token_id": 3,
        "num_labels": 1,
        "reference_compile": False,
        "attn_implementation": "eager",
    }


@pytest.fixture(scope="module")
def reference_modules(tmp_path_factory):
    pytest.importorskip("torch")
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
    import open_provence.modeling_open_provence_standalone as ref

    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    import make_toy_assets

    tok_dir = tmp_path_factory.mktemp("families_tok")
    make_toy_assets.build_tokenizer(tok_dir)
    return ref, str(tok_dir)


def _build_family(ref_and_tok, name: str):
    import torch

    ref, tok_dir = ref_and_tok
    spec = FAMILIES[name]
    backbone = _family_backbone(spec)
    config = ref.OpenProvenceConfig(
        base_model_config=backbone,
        tokenizer_name_or_path=tok_dir,
        num_labels=1,
        num_pruning_labels=2,
        max_length=128,
        pruning_config={
            "hidden_size": backbone["hidden_size"],
            "classifier_dropout": 0.0,
        },
    )
    torch.manual_seed(hash(name) % 2**31)
    model = ref.OpenProvenceModel(config)
    model.eval()
    return spec, backbone, config, model


def _expected_keys(spec: dict, backbone: dict) -> set[str]:
    """The exact inventory the published checkpoints carry (merged
    ranking_model.* + pruning_head.* layout, encoder.py:1040-1094)."""
    nb = spec["norm_bias"]
    keys = {"ranking_model.model.embeddings.tok_embeddings.weight"}

    def norm(prefix: str) -> set[str]:
        out = {f"{prefix}.weight"}
        if nb:
            out.add(f"{prefix}.bias")
        return out

    keys |= norm("ranking_model.model.embeddings.norm")
    for i in range(spec["layers"]):
        layer = f"ranking_model.model.layers.{i}"
        if i != 0:
            keys |= norm(f"{layer}.attn_norm")
        keys |= {f"{layer}.attn.Wqkv.weight", f"{layer}.attn.Wo.weight"}
        keys |= norm(f"{layer}.mlp_norm")
        keys |= {f"{layer}.mlp.Wi.weight", f"{layer}.mlp.Wo.weight"}
    keys |= norm("ranking_model.model.final_norm")
    keys |= {"ranking_model.head.dense.weight"}
    keys |= norm("ranking_model.head.norm")
    keys |= {
        "ranking_model.classifier.weight",
        "ranking_model.classifier.bias",
        "pruning_head.classifier.weight",
        "pruning_head.classifier.bias",
    }
    return keys


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_inventory_conversion_and_roundtrip(reference_modules, family):
    import torch

    from open_provence_tpu.configs import OpenProvenceConfig
    from open_provence_tpu.models.model import build_module
    from open_provence_tpu.utils.hf_convert import (
        detect_architecture,
        flax_params_to_hf,
        hf_to_flax_params,
    )

    ref = reference_modules
    spec, backbone, ref_config, ref_model = _build_family(ref, family)
    sd = {k: v for k, v in ref_model.state_dict().items()}

    # (1) Exact key inventory for this family's architecture.
    assert set(sd) == _expected_keys(spec, backbone)
    assert detect_architecture(list(sd)) == "modernbert"

    # (2) hf→flax conversion + forward logit parity vs the reference model.
    my_config = OpenProvenceConfig(
        base_model_config=backbone,
        num_labels=1,
        pruning_config={
            "hidden_size": backbone["hidden_size"],
            "classifier_dropout": 0.0,
        },
        max_length=128,
    )
    params = hf_to_flax_params(sd, my_config)
    module = build_module(my_config)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, backbone["vocab_size"], size=(2, 48)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 40:] = 0
    ids[1, 40:] = 0

    out = module.apply(
        {"params": params}, ids, mask, deterministic=True, attention_impl="xla"
    )
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        )
    np.testing.assert_allclose(
        np.asarray(out["ranking_logits"], dtype=np.float64),
        ref_out.ranking_logits.numpy().astype(np.float64),
        atol=2e-4,
        err_msg=f"{family}: ranking logits diverge",
    )
    ref_pruning = ref_out.pruning_logits.numpy().astype(np.float64)
    my_pruning = np.asarray(out["pruning_logits"], dtype=np.float64)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        my_pruning[valid], ref_pruning[valid], atol=2e-4,
        err_msg=f"{family}: pruning logits diverge",
    )

    # (3) flax→hf export: identical inventory, identical values.
    exported = flax_params_to_hf(params, my_config)
    assert set(exported) == set(sd)
    for key, value in exported.items():
        np.testing.assert_allclose(
            value, sd[key].numpy(), atol=1e-6, err_msg=f"{family}: {key}"
        )


@pytest.mark.slow
def test_convert_checkpoint_cli_on_family_dir(reference_modules, tmp_path):
    """convert_checkpoint.py must accept a reference-layout family dir and
    re-export a loadable checkpoint (en-gte: the mean-pooling family)."""
    from open_provence_tpu.configs import OpenProvenceConfig
    from open_provence_tpu.utils.hf_convert import (
        hf_to_flax_params,
        load_checkpoint,
        save_safetensors_state_dict,
    )

    ref = reference_modules
    spec, backbone, ref_config, ref_model = _build_family(ref, "en-gte")
    src = tmp_path / "src"
    src.mkdir()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    save_safetensors_state_dict(sd, src / "model.safetensors")
    (src / "config.json").write_text(json.dumps(ref_config.to_dict()))

    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    import make_toy_assets

    tok_dir = tmp_path / "tok"
    make_toy_assets.build_tokenizer(tok_dir)

    out = tmp_path / "out"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO_ROOT / "scripts" / "convert_checkpoint.py"),
            "--input", str(src),
            "--output", str(out),
            "--tokenizer", str(tok_dir),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={**__import__("os").environ, "OPEN_PROVENCE_TPU_PLATFORM": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    config, params = load_checkpoint(out)
    assert config.backbone().classifier_pooling == "mean"
    assert config.backbone().num_hidden_layers == spec["layers"]
    # Values survive the CLI round trip.
    direct = hf_to_flax_params(sd, OpenProvenceConfig.from_dict(ref_config.to_dict()))
    wo = params["ranking_model"]["model"]["layers_3"]["attn"]["Wo"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(wo),
        np.asarray(direct["ranking_model"]["model"]["layers_3"]["attn"]["Wo"]["kernel"]),
        atol=1e-6,
    )
