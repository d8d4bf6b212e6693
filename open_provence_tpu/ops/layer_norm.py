"""Fused LayerNorm for the TPU backbone.

ModernBERT runs 2 norms per layer + embedding/final norms, all bias-free
(reference config norm_bias=false; modeling_open_provence_standalone.py keeps
HF ModernBERT semantics: stats in fp32, output cast back). XLA lowers flax's
LayerNorm to a convert→reduce→convert chain that materializes fp32
intermediates — measured 11.5 ms of an 71 ms ModernBERT-base forward at
B=32, S=512 on v5e, ~4x the pure-bandwidth cost. This kernel does one pass:
read bf16, fp32 rowwise stats in VMEM, scale, write bf16.

The op carries a custom_vjp (Pallas forwards are not differentiable
otherwise); the backward uses the standard LN adjoint in plain XLA ops,
recomputing stats from the saved input — under ``nn.remat`` everything is
recomputed anyway, so saving more residuals would only cost HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import pallas_call as _pallas_call

_ROW_BLOCK = 256


def _ln_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [rows, hidden]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # E[x²] − E[x]² (matches flax's _compute_stats fp32 path).
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_forward(x2d: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    rows, hidden = x2d.shape
    row_block = _ROW_BLOCK if rows % _ROW_BLOCK == 0 else rows
    return _pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, hidden), lambda i: (i, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((row_block, hidden), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, hidden), x2d.dtype),
    )(x2d, scale.reshape(1, hidden))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _ln_core(x2d, scale, eps):
    return _ln_forward(x2d, scale, eps)


def _ln_fwd(x2d, scale, eps):
    return _ln_forward(x2d, scale, eps), (x2d, scale)


def _ln_bwd(eps, residuals, g):
    x2d, scale = residuals
    x = x2d.astype(jnp.float32)
    g = g.astype(jnp.float32)
    w = scale.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd
    gw = g * w[None, :]
    dx = rstd * (
        gw
        - jnp.mean(gw, axis=-1, keepdims=True)
        - y * jnp.mean(gw * y, axis=-1, keepdims=True)
    )
    dscale = (g * y).sum(axis=0)
    return dx.astype(x2d.dtype), dscale.astype(scale.dtype)


_ln_core.defvjp(_ln_fwd, _ln_bwd)


def pallas_layer_norm_supported(shape: tuple[int, ...]) -> bool:
    """Rows tile to sublanes, hidden to lanes."""
    hidden = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    return hidden % 128 == 0 and rows % 8 == 0


def fused_layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Bias-free LayerNorm over the last dim; stats in fp32 (flax parity)."""
    hidden = x.shape[-1]
    out = _ln_core(x.reshape(-1, hidden), scale, eps)
    return out.reshape(x.shape)


def layer_norm_reference(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None,
    eps: float,
) -> jnp.ndarray:
    """flax-parity LayerNorm in plain XLA ops (stats upcast to ≥fp32)."""
    stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(stat_dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(stat_dtype)
    if bias is not None:
        y = y + bias.astype(stat_dtype)
    return y.astype(x.dtype)


# --- fused residual-add + LayerNorm ---------------------------------------
#
# ModernBERT layers compute h = x + sub(x); LN(h). XLA keeps the residual
# add as a standalone fusion once LN moved into Pallas (~0.2 ms per add at
# B=32, S=512); reading both operands in the LN kernel and emitting (h,
# normed) removes that pass entirely.


def _add_ln_kernel(x_ref, y_ref, w_ref, h_ref, o_ref, *, eps: float):
    h32 = x_ref[...].astype(jnp.float32) + y_ref[...].astype(jnp.float32)
    h_ref[...] = h32.astype(h_ref.dtype)
    # Normalize the ROUNDED sum (parity with the unfused bf16 add + LN).
    x = h_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * w_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _add_ln_forward(x2d, y2d, scale, eps):
    rows, hidden = x2d.shape
    row_block = _ROW_BLOCK if rows % _ROW_BLOCK == 0 else rows
    return _pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(rows // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, hidden), lambda i: (i, 0)),
            pl.BlockSpec((row_block, hidden), lambda i: (i, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((row_block, hidden), lambda i: (i, 0)),
            pl.BlockSpec((row_block, hidden), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, hidden), x2d.dtype),
            jax.ShapeDtypeStruct((rows, hidden), x2d.dtype),
        ],
    )(x2d, y2d, scale.reshape(1, hidden))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _add_ln_core(x2d, y2d, scale, eps):
    return _add_ln_forward(x2d, y2d, scale, eps)


def _add_ln_fwd(x2d, y2d, scale, eps):
    h, normed = _add_ln_forward(x2d, y2d, scale, eps)
    return (h, normed), (h, scale)


def _add_ln_bwd(eps, residuals, gs):
    h2d, scale = residuals
    gh, gn = gs  # cotangents of (h, normed)
    dxn, dscale = _ln_bwd(eps, (h2d, scale), gn)
    dh = (dxn.astype(jnp.float32) + gh.astype(jnp.float32)).astype(h2d.dtype)
    return dh, dh, dscale


_add_ln_core.defvjp(_add_ln_fwd, _add_ln_bwd)


def fused_add_layer_norm(
    x: jnp.ndarray, y: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x + y, LayerNorm(x + y)) in one HBM pass."""
    hidden = x.shape[-1]
    h, normed = _add_ln_core(
        x.reshape(-1, hidden), y.reshape(-1, hidden), scale, eps
    )
    return h.reshape(x.shape), normed.reshape(x.shape)
