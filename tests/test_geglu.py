"""Fused GeGLU kernel: parity with the unfused composition + gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
from scipy.special import erf as scipy_erf

from open_provence_tpu.ops.geglu import (
    _erf_approx,
    _geglu_reference,
    fused_geglu,
    geglu_supported,
)


def test_geglu_supported():
    assert geglu_supported(512, 768, 1152, 2)
    assert not geglu_supported(100, 768, 1152, 2)   # rows not tileable
    assert not geglu_supported(512, 700, 1152, 2)   # K not lane-aligned
    assert not geglu_supported(512, 768, 1100, 2)   # I not lane-aligned
    assert not geglu_supported(512, 768, 1152, 2, "tanh")  # unknown act


def test_erf_approx_accuracy():
    """Eigen rational erf: a few fp32 ulps of the true erf, and within
    fp32 rounding of XLA's own lowering."""
    x = np.linspace(-6.0, 6.0, 20001, dtype=np.float64)
    xs = jnp.asarray(x, jnp.float32)
    ours = np.asarray(_erf_approx(xs), np.float64)
    assert np.max(np.abs(ours - scipy_erf(x))) < 1e-6
    jax_erf = np.asarray(jax.scipy.special.erf(xs), np.float64)
    assert np.max(np.abs(ours - jax_erf)) < 1e-6


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("act", ["gelu", "gelu_pytorch_tanh", "silu"])
def test_geglu_matches_reference(dtype, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(256, 128)), dtype=dtype)
    wi = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, dtype=dtype)
    with pltpu.force_tpu_interpret_mode():
        out = fused_geglu(x, wi, act)
    ref = _geglu_reference(x, wi, act)
    assert out.dtype == dtype
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol, rtol=atol
    )


def test_geglu_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(128, 128)), dtype=jnp.float32)
    wi = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, dtype=jnp.float32)

    def loss_fused(x_, w_):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_geglu(x_, w_, "gelu") ** 2)

    def loss_ref(x_, w_):
        return jnp.sum(_geglu_reference(x_, w_, "gelu") ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, wi)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wi)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=1e-4, rtol=1e-4)


def test_mlp_param_tree_is_path_independent(monkeypatch):
    """The fused and unfused MLP paths must produce identical param trees
    (checkpoints are interchangeable)."""
    from open_provence_tpu.configs import ModernBertBackboneConfig
    from open_provence_tpu.models.modernbert import ModernBertMLP

    cfg = ModernBertBackboneConfig(
        vocab_size=128, hidden_size=128, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=64, local_attention=8,
        pad_token_id=0, num_labels=1,
    )
    x = np.zeros((2, 64, 128), np.float32)
    mlp = ModernBertMLP(cfg)
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FUSED_GEGLU", "0")
    tree_off = jax.tree.map(lambda v: v.shape, mlp.init(jax.random.PRNGKey(0), x))
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FUSED_GEGLU", "1")
    tree_on = jax.tree.map(lambda v: v.shape, mlp.init(jax.random.PRNGKey(0), x))
    assert tree_off == tree_on
    assert tree_on == {
        "params": {"Wi": {"kernel": (128, 256)}, "Wo": {"kernel": (128, 128)}}
    }
