"""Model dtype auto-selection (counterpart of the reference's
test_modeling_default_dtype.py: cuda→bf16/fp16, cpu→fp32). Here: TPU→bf16,
CPU→fp32, explicit override always wins."""

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_dtypes(model):
    return {x.dtype for x in jax.tree.leaves(model.params) if hasattr(x, "dtype")}


def test_cpu_default_keeps_fp32(tmp_path):
    from tests.test_process_engine import _tiny_model
    from open_provence_tpu.inference import OpenProvenceModel
    from open_provence_tpu.utils.hf_convert import (
        flax_params_to_hf,
        save_safetensors_state_dict,
    )
    from tests.dummy_tokenizers import DummyTokenizer

    base = _tiny_model()
    base.config.save(tmp_path)
    save_safetensors_state_dict(
        flax_params_to_hf(jax.device_get(base.params), base.config),
        tmp_path / "model.safetensors",
    )
    model = OpenProvenceModel.from_pretrained(tmp_path, tokenizer=DummyTokenizer())
    assert jax.devices()[0].platform == "cpu"
    assert jnp.dtype(jnp.float32) in _leaf_dtypes(model)
    assert jnp.dtype(jnp.bfloat16) not in _leaf_dtypes(model)

    # Explicit override casts floating params.
    model_bf16 = OpenProvenceModel.from_pretrained(
        tmp_path, tokenizer=DummyTokenizer(), dtype=jnp.bfloat16
    )
    floating = {
        x.dtype
        for x in jax.tree.leaves(model_bf16.params)
        if jnp.issubdtype(x.dtype, jnp.floating)
    }
    assert floating == {jnp.dtype(jnp.bfloat16)}

    # bf16 model still produces fp32 probabilities (logits upcast).
    raw = model_bf16.get_raw_predictions("q", ["some text."])
    assert raw.pruning_probs.dtype == np.float32
