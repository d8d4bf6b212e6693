"""Fused Pallas LayerNorm vs flax nn.LayerNorm (interpret mode on CPU)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from open_provence_tpu.ops.layer_norm import (
    fused_layer_norm,
    layer_norm_reference,
    pallas_layer_norm_supported,
)


def _ref(x, scale, eps=1e-5):
    return nn.LayerNorm(epsilon=eps, use_bias=False).apply(
        {"params": {"scale": scale}}, x
    )


def test_supported_shapes():
    assert pallas_layer_norm_supported((16, 512, 768))
    assert not pallas_layer_norm_supported((16, 512, 100))  # lanes
    assert not pallas_layer_norm_supported((3, 1, 768))  # rows


@pytest.mark.parametrize("shape", [(16, 256), (2, 64, 384)])
def test_fused_matches_flax(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 3 + 1, jnp.float32)
    scale = jnp.asarray(rng.normal(size=shape[-1:]) + 1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = fused_layer_norm(x, scale, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(x, scale)), atol=3e-6, rtol=3e-6
    )


def test_reference_matches_flax_with_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)) + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    ref = nn.LayerNorm(epsilon=1e-5, use_bias=True).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    mine = layer_norm_reference(x, scale, bias, 1e-5)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=3e-6, rtol=3e-6)


def test_fused_gradients():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(256,)) + 1, jnp.float32)

    def loss_fused(x, s):
        return (fused_layer_norm(x, s, 1e-5).astype(jnp.float32) ** 2).sum()

    def loss_ref(x, s):
        return (_ref(x, s).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        ga = jax.grad(loss_fused, argnums=(0, 1))(x, scale)
    gb = jax.grad(loss_ref, argnums=(0, 1))(x, scale)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_pallas_backward_matches_xla_adjoint(monkeypatch):
    """The one-pass Pallas LN backward (r5) vs the XLA adjoint it replaced."""
    from open_provence_tpu.ops import layer_norm as ln

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(32, 256)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(256,)) + 1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(32, 256)), jnp.bfloat16)

    with pltpu.force_tpu_interpret_mode():
        dx_p, ds_p = ln._ln_bwd_pallas(1e-5, x, scale, g)
    dx_x, ds_x = ln._ln_bwd_xla(1e-5, (x, scale), g)
    np.testing.assert_allclose(
        np.asarray(dx_p, np.float32), np.asarray(dx_x, np.float32),
        atol=1e-2, rtol=1e-2,
    )
    np.testing.assert_allclose(np.asarray(ds_p), np.asarray(ds_x), atol=1e-3, rtol=1e-3)

    # Env kill switch falls back to the XLA adjoint.
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FUSED_LN_BWD", "0")
    dx_e, ds_e = ln._ln_bwd(1e-5, (x, scale), g)
    np.testing.assert_allclose(np.asarray(dx_e, np.float32), np.asarray(dx_x, np.float32))
    np.testing.assert_allclose(np.asarray(ds_e), np.asarray(ds_x))


def test_add_ln_gradients_fused_gh():
    """fused_add_layer_norm's backward fuses the residual-stream cotangent
    into the LN-adjoint kernel; gradients must match the composite reference
    for BOTH outputs' cotangents flowing."""
    from open_provence_tpu.ops.layer_norm import fused_add_layer_norm

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(256,)) + 1, jnp.float32)

    def loss_fused(x, y, s):
        h, normed = fused_add_layer_norm(x, y, s, 1e-5)
        return (normed.astype(jnp.float32) ** 2).sum() + (
            h.astype(jnp.float32) * 0.3
        ).sum()

    def loss_ref(x, y, s):
        h = x + y
        return (_ref(h, s).astype(jnp.float32) ** 2).sum() + (
            h.astype(jnp.float32) * 0.3
        ).sum()

    with pltpu.force_tpu_interpret_mode():
        ga = jax.grad(loss_fused, argnums=(0, 1, 2))(x, y, scale)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, y, scale)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)
