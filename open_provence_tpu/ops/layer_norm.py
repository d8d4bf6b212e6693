"""Fused LayerNorm for the TPU backbone.

ModernBERT runs 2 norms per layer + embedding/final norms, all bias-free
(reference config norm_bias=false; modeling_open_provence_standalone.py keeps
HF ModernBERT semantics: stats in fp32, output cast back). XLA lowers flax's
LayerNorm to a convert→reduce→convert chain that materializes fp32
intermediates — measured 11.5 ms of an 71 ms ModernBERT-base forward at
B=32, S=512 on v5e, ~4x the pure-bandwidth cost. This kernel does one pass:
read bf16, fp32 rowwise stats in VMEM, scale, write bf16.

The op carries a custom_vjp (Pallas forwards are not differentiable
otherwise); the backward recomputes stats from the saved input — under
``nn.remat`` everything is recomputed anyway, so saving more residuals
would only cost HBM. On TPU the adjoint runs as a one-pass Pallas kernel
(dx + accumulated dscale per tile, residual-stream cotangent folded in for
the add+LN form); ``OPEN_PROVENCE_TPU_FUSED_LN_BWD=0`` falls back to the
plain-XLA adjoint. Whole-step throughput is identical either way at b64
S512 (see _ln_bwd_kernel docstring).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _ln_bwd_xla(eps, residuals, g):
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


def _ln_bwd_kernel(
    x_ref, g_ref, w_ref, *tail, eps: float, num_tiles: int, add_grad: bool
):
    """LN adjoint, one row tile per grid step: recompute fp32 stats in VMEM,
    write dx (optionally + an extra cotangent — the residual-stream gradient
    that _add_ln_bwd would otherwise add in a separate XLA pass), accumulate
    dscale in a VMEM scratch flushed on the last tile.

    The XLA adjoint materializes the fp32 [rows, hidden] intermediates and
    its dscale row-sum relayouts them ({2,1,0} -> {1,2,0} copies, ~0.13 ms
    x22 layers at b64 S512 in the profile) — one pass here keeps everything
    tile-local. Whole-step A/B on v5e (r5, consecutive fresh jits, b64
    S512): NEUTRAL — 227.3/227.9 ms vs 227.5 ms XLA; the relayout copies
    evidently overlap with compute. Kept (default on) because it also
    absorbs the residual-stream add of _add_ln_bwd into the same pass and
    parity is kernel-tested; OPEN_PROVENCE_TPU_FUSED_LN_BWD=0 reverts."""
    if add_grad:
        gh_ref, dx_ref, dscale_ref, ds_acc = tail
    else:
        gh_ref = None
        dx_ref, dscale_ref, ds_acc = tail
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ds_acc[...] = jnp.zeros_like(ds_acc)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)  # [1, hidden]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (x - mean) * rstd
    gw = g * w
    dx = rstd * (
        gw
        - jnp.mean(gw, axis=-1, keepdims=True)
        - y * jnp.mean(gw * y, axis=-1, keepdims=True)
    )
    ds_acc[...] += jnp.sum(g * y, axis=0, keepdims=True)
    if add_grad:
        dx = dx + gh_ref[...].astype(jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == num_tiles - 1)
    def _finalize():
        dscale_ref[...] = ds_acc[...].astype(dscale_ref.dtype)


def _ln_bwd_pallas(eps, x2d, scale, g, gh=None):
    rows, hidden = x2d.shape
    row_block = _ROW_BLOCK if rows % _ROW_BLOCK == 0 else rows
    num_tiles = rows // row_block
    tile_spec = pl.BlockSpec((row_block, hidden), lambda i: (i, 0))
    scale_spec = pl.BlockSpec((1, hidden), lambda i: (0, 0))
    inputs = [x2d, g] + ([gh] if gh is not None else [])
    dx, dscale = _pallas_call(
        functools.partial(
            _ln_bwd_kernel,
            eps=eps, num_tiles=num_tiles, add_grad=gh is not None,
        ),
        grid=(num_tiles,),
        in_specs=[tile_spec, tile_spec, scale_spec]
        + ([tile_spec] if gh is not None else []),
        out_specs=[tile_spec, scale_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, hidden), x2d.dtype),
            jax.ShapeDtypeStruct((1, hidden), scale.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((1, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x2d, g, scale.reshape(1, hidden), *([gh] if gh is not None else []))
    return dx, dscale.reshape(scale.shape)


def _use_ln_bwd_pallas(x2d) -> bool:
    return (
        os.environ.get("OPEN_PROVENCE_TPU_FUSED_LN_BWD", "1") != "0"
        and pallas_layer_norm_supported(x2d.shape)
    )


def _ln_bwd(eps, residuals, g):
    x2d, scale = residuals
    if _use_ln_bwd_pallas(x2d):
        return _ln_bwd_pallas(eps, x2d, scale, g)
    return _ln_bwd_xla(eps, residuals, g)


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
    if _use_ln_bwd_pallas(h2d):
        # The residual-stream cotangent adds inside the kernel (fp32, before
        # the bf16 round) — one pass instead of LN-adjoint + separate add.
        dh, dscale = _ln_bwd_pallas(eps, h2d, scale, gn, gh=gh)
        return dh, dh, dscale
    dxn, dscale = _ln_bwd_xla(eps, (h2d, scale), gn)
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
