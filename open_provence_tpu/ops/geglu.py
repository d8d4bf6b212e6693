"""Fused GeGLU: act(x @ Wi_inp) * (x @ Wi_gate) in one Pallas kernel.

ModernBERT's MLP projects to 2*intermediate and gates
(reference open_provence/ uses HF ModernBertMLP; our JAX counterpart is
models/modernbert.py::ModernBertMLP). On TPU, XLA materializes the
[B*S, 2I] Wi output in HBM and input-fuses the gelu-gate into the Wo2
matmul, which drops that GEMM to ~3x off peak (profiled 0.436 ms vs
0.147 ms SoL per layer at B=32, S=512, ModernBERT-base). This kernel
computes both Wi halves as fp32 accumulators in VMEM and applies the
activation epilogue in-register, so the 2I-wide intermediate never
touches HBM (saves ~150 MB/layer of traffic at base-512 shapes).

Mosaic has no erf/erfc lowering, so exact GeLU evaluates Eigen's
rational-polynomial erf in-register — the same approximation XLA's own
erf lowering uses, so the kernel agrees with the unfused composition to
a few fp32 ulps (measured 5e-7), far below a bf16 half-ulp.

Numerics: accumulation fp32; each half is rounded to the input dtype
(the unfused composition's rounding point), the activation is evaluated
in fp32 on the rounded value, rounded back, and the gate product runs
in the storage dtype — mirroring XLA's round→transcendental→round chain.

The op carries a custom_vjp whose backward recomputes through the plain
XLA composition (two GEMMs), like the flash kernel's XLA fallback path.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import pallas_call as _pallas_call
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 24 * 1024 * 1024
_SQRT_2 = math.sqrt(2.0)
_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)


# Eigen's generic_fast_erf_float rational approximation (the same one
# XLA lowers erf to): erf(x) ≈ x·P(x²)/Q(x²) on the clamp [-4, 4].
# Near 1-ulp fp32 accuracy, built from mul/add/div only (Mosaic-lowerable)
# — and numerically the same polynomial the unfused XLA path evaluates.
_ERF_ALPHA = (
    -2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
    -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_BETA = (
    -1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
    -7.37332916720468e-03, -1.42647390514189e-02,
)


def _erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = _ERF_ALPHA[0]
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + c
    p = p * x
    q = _ERF_BETA[0]
    for c in _ERF_BETA[1:]:
        q = q * x2 + c
    return p / q


def _gelu_exact_kernel(x):
    return 0.5 * x * (1.0 + _erf_approx(x / _SQRT_2))


def _gelu_tanh_kernel(x):
    inner = _SQRT_2_OVER_PI * (x + 0.044715 * (x * x * x))
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _silu_kernel(x):
    return x / (1.0 + jnp.exp(-x))


# In-kernel epilogues (fp32 in, fp32 out), keyed by HF activation name.
_KERNEL_ACTIVATIONS = {
    "gelu": _gelu_exact_kernel,
    "gelu_new": _gelu_tanh_kernel,
    "gelu_pytorch_tanh": _gelu_tanh_kernel,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "silu": _silu_kernel,
    "swish": _silu_kernel,
}

# XLA-side activations for the reference path / backward recompute.
_REFERENCE_ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
}


def _pick_block_m(m: int, k: int, intermediate: int, itemsize: int) -> int | None:
    """Largest row tile whose working set fits the VMEM budget."""
    weights = 2 * k * intermediate * itemsize
    for bm in (512, 256, 128):
        if m % bm != 0:
            continue
        acc = 2 * bm * intermediate * 4
        x_tile = bm * k * itemsize
        out = bm * intermediate * itemsize
        # x/out are double-buffered by the pipeline; weights are grid-constant.
        if weights + acc + 2 * (x_tile + out) <= _VMEM_BUDGET:
            return bm
    return None


def geglu_supported(
    m: int, k: int, intermediate: int, itemsize: int = 2, activation: str = "gelu"
) -> bool:
    # intermediate only needs 64-lane alignment: Mosaic pads the lane dim
    # internally (verified on-chip for ModernBERT-large I=2624 and
    # xsmall I=576, both % 128 != 0).
    return (
        activation in _KERNEL_ACTIVATIONS
        and k % 128 == 0
        and intermediate % 64 == 0
        and _pick_block_m(m, k, intermediate, itemsize) is not None
    )


def _ln_rows(x, scale, eps):
    """Rowwise LayerNorm prologue: fp32 stats from the storage-dtype input,
    output rounded back — the same round points as ops/layer_norm.py, so
    folding the LN in is numerically identical to the separate kernel."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _geglu_kernel(x_ref, w_inp_ref, w_gate_ref, o_ref, *, activation):
    _geglu_body(x_ref[...], w_inp_ref, w_gate_ref, o_ref, activation)


def _ln_geglu_kernel(x_ref, s_ref, w_inp_ref, w_gate_ref, o_ref, *,
                     activation, eps):
    x = _ln_rows(x_ref[...], s_ref[...], eps)
    _geglu_body(x, w_inp_ref, w_gate_ref, o_ref, activation)


def _geglu_body(x, w_inp_ref, w_gate_ref, o_ref, activation):
    acc_inp = jax.lax.dot_general(
        x, w_inp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_gate = jax.lax.dot_general(
        x, w_gate_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    act_fn = _KERNEL_ACTIVATIONS[activation]
    # Round to storage dtype first (the unfused composition's rounding
    # point), evaluate the transcendental in fp32, round back, gate in
    # storage dtype.
    inp = acc_inp.astype(o_ref.dtype).astype(jnp.float32)
    gate = acc_gate.astype(o_ref.dtype)
    o_ref[...] = act_fn(inp).astype(o_ref.dtype) * gate


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_geglu(x2d: jnp.ndarray, wi: jnp.ndarray, activation: str) -> jnp.ndarray:
    """x2d [M, K] @ wi [K, 2I] → act(first half) * second half, [M, I]."""
    return _geglu_forward(x2d, wi, activation)


def _geglu_forward(x2d, wi, activation, ln_scale=None, ln_eps=1e-5):
    m, k = x2d.shape
    intermediate = wi.shape[1] // 2
    itemsize = jnp.dtype(x2d.dtype).itemsize
    bm = _pick_block_m(m, k, intermediate, itemsize)
    if bm is None or activation not in _KERNEL_ACTIVATIONS:
        raise ValueError(
            f"fused_geglu unsupported for M={m} K={k} I={intermediate} "
            f"act={activation!r}"
        )
    w_inp = wi[:, :intermediate]
    w_gate = wi[:, intermediate:]
    if ln_scale is None:
        kernel = functools.partial(_geglu_kernel, activation=activation)
        extra_inputs, extra_specs = [], []
    else:
        kernel = functools.partial(
            _ln_geglu_kernel, activation=activation, eps=ln_eps
        )
        extra_inputs = [ln_scale.reshape(1, k)]
        extra_specs = [pl.BlockSpec((1, k), lambda i: (0, 0))]
    return _pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            *extra_specs,
            # Grid-constant blocks: DMA'd once, reused by every row tile.
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, intermediate), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, intermediate), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * intermediate,
            bytes_accessed=(x2d.size + wi.size + m * intermediate) * itemsize,
            transcendentals=m * intermediate,
        ),
    )(x2d, *extra_inputs, w_inp, w_gate)


def _geglu_reference(x2d, wi, activation):
    """The unfused composition (matches the kernel's rounding points)."""
    act_fn = _REFERENCE_ACTIVATIONS[activation]
    proj = jnp.dot(x2d, wi, preferred_element_type=jnp.float32).astype(x2d.dtype)
    inp, gate = jnp.split(proj, 2, axis=-1)
    return act_fn(inp) * gate


def _geglu_fwd(x2d, wi, activation):
    return _geglu_forward(x2d, wi, activation), (x2d, wi)


def _geglu_bwd(activation, residuals, g):
    x2d, wi = residuals
    _, vjp = jax.vjp(lambda x_, w_: _geglu_reference(x_, w_, activation), x2d, wi)
    return vjp(g)


fused_geglu.defvjp(_geglu_fwd, _geglu_bwd)


# ---------------------------------------------------------------------------
# LayerNorm-prologue variants: the pre-MLP / pre-attention norms feed ONLY
# their adjacent GEMM, so the norm can run in the GEMM kernel's row tiles
# (fp32 stats in-register) instead of a separate HBM read/write pass.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_ln_geglu(
    x2d: jnp.ndarray, ln_scale: jnp.ndarray, wi: jnp.ndarray,
    activation: str, eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm(x2d)·scale [M, K] @ wi [K, 2I] → act·gate, [M, I]."""
    return _geglu_forward(x2d, wi, activation, ln_scale, eps)


def _ln_geglu_reference(x2d, ln_scale, wi, activation, eps):
    from .layer_norm import layer_norm_reference

    return _geglu_reference(
        layer_norm_reference(x2d, ln_scale, None, eps), wi, activation
    )


def _ln_geglu_fwd(x2d, ln_scale, wi, activation, eps):
    return _geglu_forward(x2d, wi, activation, ln_scale, eps), (x2d, ln_scale, wi)


def _ln_geglu_bwd(activation, eps, residuals, g):
    x2d, ln_scale, wi = residuals
    m, k = x2d.shape
    intermediate = wi.shape[1] // 2
    itemsize = jnp.dtype(x2d.dtype).itemsize

    if (
        os.environ.get("OPEN_PROVENCE_TPU_FUSED_GEGLU_BWD", "1") != "0"
        and _pick_block_m_bwd(m, k, intermediate, itemsize) is not None
    ):
        return _ln_geglu_bwd_pallas(x2d, ln_scale, wi, g, activation, eps)
    _, vjp = jax.vjp(
        lambda x_, s_, w_: _ln_geglu_reference(x_, s_, w_, activation, eps),
        x2d, ln_scale, wi,
    )
    return vjp(g)


fused_ln_geglu.defvjp(_ln_geglu_fwd, _ln_geglu_bwd)


# -- Fused backward: one pass recomputes LN + both Wi halves in VMEM and
# produces dx / dscale / dWi without ever materializing the [M, 2I]
# intermediate or the LN output in HBM (the XLA recompute path pays both).

# Activation derivatives, fp32, Mosaic-lowerable.
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gelu_exact_grad(x):
    cdf = 0.5 * (1.0 + _erf_approx(x / _SQRT_2))
    return cdf + x * _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)


def _gelu_tanh_grad(x):
    u = _SQRT_2_OVER_PI * (x + 0.044715 * (x * x * x))
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * (x * x))
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _silu_grad(x):
    s = 1.0 / (1.0 + jnp.exp(-x))
    return s * (1.0 + x * (1.0 - s))


_KERNEL_ACTIVATION_GRADS = {
    "gelu": _gelu_exact_grad,
    "gelu_new": _gelu_tanh_grad,
    "gelu_pytorch_tanh": _gelu_tanh_grad,
    "relu": lambda x: (x > 0.0).astype(x.dtype),
    "silu": _silu_grad,
    "swish": _silu_grad,
}


def _pick_block_m_bwd(m: int, k: int, intermediate: int, itemsize: int) -> int | None:
    """Row tile for the backward kernel: weights + two fp32 dW accumulators
    stay resident; x/g/dx tiles and the fp32 intermediates are per-tile.
    ``OPEN_PROVENCE_TPU_GEGLU_BWD_BM`` overrides the tile for sweeps."""
    if k % 128 != 0 or intermediate % 64 != 0:
        return None
    env_bm = os.environ.get("OPEN_PROVENCE_TPU_GEGLU_BWD_BM")
    if env_bm:
        bm = int(env_bm)
        return bm if m % bm == 0 else None
    resident = 2 * k * intermediate * itemsize + 2 * k * intermediate * 4
    for bm in (256, 128):
        if m % bm != 0:
            continue
        tiles = 2 * bm * (2 * k + intermediate) * itemsize  # x,g,dx dbl-buffered
        acc = 2 * bm * intermediate * 4 + 2 * bm * k * 4
        if resident + tiles + acc <= _VMEM_BUDGET:
            return bm
    return None


def _ln_geglu_bwd_kernel(
    x_ref, s_ref, g_ref, w_inp_ref, w_gate_ref,
    dx_ref, dwi_ref, dscale_ref,
    dw_inp_acc, dw_gate_acc, ds_acc,
    *, activation, eps, num_tiles,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_inp_acc[...] = jnp.zeros_like(dw_inp_acc)
        dw_gate_acc[...] = jnp.zeros_like(dw_gate_acc)
        ds_acc[...] = jnp.zeros_like(ds_acc)

    x = x_ref[...].astype(jnp.float32)
    scale = s_ref[...].astype(jnp.float32)  # [1, K]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    h = (x - mean) * rstd  # [bm, K] fp32
    xn = (h * scale).astype(x_ref.dtype)  # geglu input (forward round point)

    acc_inp = jax.lax.dot_general(
        xn, w_inp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_gate = jax.lax.dot_general(
        xn, w_gate_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inp = acc_inp.astype(x_ref.dtype).astype(jnp.float32)
    gate = acc_gate.astype(x_ref.dtype).astype(jnp.float32)
    act_fn = _KERNEL_ACTIVATIONS[activation]
    act_grad = _KERNEL_ACTIVATION_GRADS[activation]
    a = act_fn(inp).astype(x_ref.dtype).astype(jnp.float32)
    da = act_grad(inp)

    gf = g_ref[...].astype(jnp.float32)
    gi = (gf * da * gate).astype(x_ref.dtype)  # d acc_inp
    gg = (gf * a).astype(x_ref.dtype)  # d acc_gate

    # dW halves: contraction over rows (same pattern as the flash dk/dv).
    dw_inp_acc[...] += jax.lax.dot_general(
        xn, gi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw_gate_acc[...] += jax.lax.dot_general(
        xn, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    # d(LN output) via the weight transposes (contract the lane dims).
    dy = jax.lax.dot_general(
        gi, w_inp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        gg, w_gate_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, K] fp32

    ds_acc[...] += jnp.sum(dy * h, axis=0, keepdims=True)
    dh = dy * scale
    dx = rstd * (
        dh
        - jnp.mean(dh, axis=-1, keepdims=True)
        - h * jnp.mean(dh * h, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == num_tiles - 1)
    def _finalize():
        dwi_ref[:, : dw_inp_acc.shape[1]] = dw_inp_acc[...].astype(dwi_ref.dtype)
        dwi_ref[:, dw_inp_acc.shape[1]:] = dw_gate_acc[...].astype(dwi_ref.dtype)
        dscale_ref[...] = ds_acc[...].astype(dscale_ref.dtype)


def _ln_geglu_bwd_pallas(x2d, ln_scale, wi, g, activation, eps):
    m, k = x2d.shape
    intermediate = wi.shape[1] // 2
    itemsize = jnp.dtype(x2d.dtype).itemsize
    bm = _pick_block_m_bwd(m, k, intermediate, itemsize)
    w_inp = wi[:, :intermediate]
    w_gate = wi[:, intermediate:]
    num_tiles = m // bm
    dx, dwi, dscale = _pallas_call(
        functools.partial(
            _ln_geglu_bwd_kernel,
            activation=activation, eps=eps, num_tiles=num_tiles,
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((bm, intermediate), lambda i: (i, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, 2 * intermediate), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x2d.dtype),
            jax.ShapeDtypeStruct((k, 2 * intermediate), wi.dtype),
            jax.ShapeDtypeStruct((1, k), ln_scale.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, intermediate), jnp.float32),
            pltpu.VMEM((k, intermediate), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * m * k * intermediate,
            bytes_accessed=(2 * x2d.size + g.size + wi.size * 2) * itemsize,
            transcendentals=2 * m * intermediate,
        ),
    )(x2d, ln_scale.reshape(1, k), g, w_inp, w_gate)
    return dx, dscale.reshape(ln_scale.shape), dwi


# ---------------------------------------------------------------------------
# Full-MLP fusion: LN → GeGLU → Wo in ONE kernel, forward and backward.
#
# The split path materializes the [M, I] act·gate output in HBM (forward:
# one write + one read for the Wo GEMM; backward: one read for dWo plus a
# write + read of the [M, I] dh = g @ Woᵀ feeding the GeGLU backward
# kernel). Folding the Wo tail into the row tiles is FLOP-neutral — the
# backward already recomputes act·gate for the activation gradient — and
# removes ~300 MB/layer (bwd) + ~150 MB/layer (fwd) of HBM traffic at
# base-512 shapes. ``OPEN_PROVENCE_TPU_FUSED_MLP_TAIL=0`` reverts to the
# split LN+GeGLU kernel + XLA Wo GEMM.
# ---------------------------------------------------------------------------


def _pick_block_m_tail(m: int, k: int, intermediate: int, itemsize: int) -> int | None:
    """Row tile for the forward LN→GeGLU→Wo kernel: Wi halves + Wo stay
    resident; per-tile x/out plus fp32 accumulators for both Wi halves and
    the Wo output."""
    weights = 3 * k * intermediate * itemsize
    for bm in (512, 256, 128):
        if m % bm != 0:
            continue
        acc = 2 * bm * intermediate * 4 + bm * k * 4
        x_tile = bm * k * itemsize
        out = bm * k * itemsize
        if weights + acc + 2 * (x_tile + out) <= _VMEM_BUDGET:
            return bm
    return None


def geglu_wo_supported(
    m: int, k: int, intermediate: int, itemsize: int = 2, activation: str = "gelu"
) -> bool:
    return (
        activation in _KERNEL_ACTIVATIONS
        and k % 128 == 0
        and intermediate % 64 == 0
        and _pick_block_m_tail(m, k, intermediate, itemsize) is not None
    )


def _ln_geglu_wo_kernel(x_ref, s_ref, w_inp_ref, w_gate_ref, wo_ref, o_ref, *,
                        activation, eps):
    x = _ln_rows(x_ref[...], s_ref[...], eps)
    acc_inp = jax.lax.dot_general(
        x, w_inp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_gate = jax.lax.dot_general(
        x, w_gate_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    act_fn = _KERNEL_ACTIVATIONS[activation]
    inp = acc_inp.astype(o_ref.dtype).astype(jnp.float32)
    gate = acc_gate.astype(o_ref.dtype)
    h = act_fn(inp).astype(o_ref.dtype) * gate  # storage dtype (split path's
    # rounding point: act·gate was the split kernel's HBM output)
    acc_out = jax.lax.dot_general(
        h, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc_out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_ln_geglu_wo(
    x2d: jnp.ndarray, ln_scale: jnp.ndarray, wi: jnp.ndarray, wo: jnp.ndarray,
    activation: str, eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm(x2d)·scale [M, K] @ wi → act·gate [M, I] @ wo [I, K] → [M, K],
    one kernel; the [M, I] intermediate never touches HBM.

    ``OPEN_PROVENCE_TPU_FUSED_MLP_TAIL=bwd`` keeps the forward split (LN+GeGLU
    kernel + XLA Wo GEMM — same round points, so values are identical) and
    fuses only the BACKWARD, where most of the traffic saving lives (dh
    write+read and the h re-read) without the forward's dependent-dot stall."""
    return _ln_geglu_wo_forward_dispatch(x2d, ln_scale, wi, wo, activation, eps)


def _ln_geglu_wo_forward_dispatch(x2d, ln_scale, wi, wo, activation, eps):
    if os.environ.get("OPEN_PROVENCE_TPU_FUSED_MLP_TAIL") == "bwd":
        h = _geglu_forward(x2d, wi, activation, ln_scale, eps)
        return jnp.dot(h, wo, preferred_element_type=jnp.float32).astype(x2d.dtype)
    return _ln_geglu_wo_forward(x2d, ln_scale, wi, wo, activation, eps)


def _ln_geglu_wo_forward(x2d, ln_scale, wi, wo, activation, eps):
    m, k = x2d.shape
    intermediate = wi.shape[1] // 2
    itemsize = jnp.dtype(x2d.dtype).itemsize
    bm = _pick_block_m_tail(m, k, intermediate, itemsize)
    if bm is None or activation not in _KERNEL_ACTIVATIONS:
        raise ValueError(
            f"fused_ln_geglu_wo unsupported for M={m} K={k} I={intermediate} "
            f"act={activation!r}"
        )
    w_inp = wi[:, :intermediate]
    w_gate = wi[:, intermediate:]
    return _pallas_call(
        functools.partial(_ln_geglu_wo_kernel, activation=activation, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
            pl.BlockSpec((intermediate, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k * intermediate,
            bytes_accessed=(2 * x2d.size + wi.size + wo.size) * itemsize,
            transcendentals=m * intermediate,
        ),
    )(x2d, ln_scale.reshape(1, k), w_inp, w_gate, wo)


def _ln_geglu_wo_reference(x2d, ln_scale, wi, wo, activation, eps):
    h = _ln_geglu_reference(x2d, ln_scale, wi, activation, eps)
    return jnp.dot(h, wo, preferred_element_type=jnp.float32).astype(x2d.dtype)


def _ln_geglu_wo_fwd(x2d, ln_scale, wi, wo, activation, eps):
    return (
        _ln_geglu_wo_forward_dispatch(x2d, ln_scale, wi, wo, activation, eps),
        (x2d, ln_scale, wi, wo),
    )


def _pick_block_m_tail_bwd(m: int, k: int, intermediate: int, itemsize: int) -> int | None:
    """Row tile for the fused backward: Wi halves + Wo and fp32 dWi/dWo
    accumulators stay resident across the whole grid."""
    if k % 128 != 0 or intermediate % 64 != 0:
        return None
    env_bm = os.environ.get("OPEN_PROVENCE_TPU_GEGLU_BWD_BM")
    if env_bm:
        bm = int(env_bm)
        return bm if m % bm == 0 else None
    resident = 3 * k * intermediate * (itemsize + 4)
    for bm in (256, 128):
        if m % bm != 0:
            continue
        tiles = 2 * bm * 3 * k * itemsize  # x, g, dx double-buffered
        acc = 2 * bm * intermediate * 4 + 2 * bm * k * 4
        if resident + tiles + acc <= _VMEM_BUDGET:
            return bm
    return None


def _ln_geglu_wo_bwd_kernel(
    x_ref, s_ref, g_ref, w_inp_ref, w_gate_ref, wo_ref,
    dx_ref, dwi_ref, dwo_ref, dscale_ref,
    dw_inp_acc, dw_gate_acc, dwo_acc, ds_acc,
    *, activation, eps, num_tiles,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_inp_acc[...] = jnp.zeros_like(dw_inp_acc)
        dw_gate_acc[...] = jnp.zeros_like(dw_gate_acc)
        dwo_acc[...] = jnp.zeros_like(dwo_acc)
        ds_acc[...] = jnp.zeros_like(ds_acc)

    x = x_ref[...].astype(jnp.float32)
    scale = s_ref[...].astype(jnp.float32)  # [1, K]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    hn = (x - mean) * rstd  # LN hidden, [bm, K] fp32
    xn = (hn * scale).astype(x_ref.dtype)

    acc_inp = jax.lax.dot_general(
        xn, w_inp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_gate = jax.lax.dot_general(
        xn, w_gate_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inp = acc_inp.astype(x_ref.dtype).astype(jnp.float32)
    gate = acc_gate.astype(x_ref.dtype).astype(jnp.float32)
    act_fn = _KERNEL_ACTIVATIONS[activation]
    act_grad = _KERNEL_ACTIVATION_GRADS[activation]
    a = act_fn(inp).astype(x_ref.dtype).astype(jnp.float32)
    da = act_grad(inp)
    h = (a * gate).astype(x_ref.dtype)  # forward's act·gate round point

    g = g_ref[...]  # [bm, K] storage dtype
    dwo_acc[...] += jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh = jax.lax.dot_general(
        g, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, I] fp32

    gi = (dh * da * gate).astype(x_ref.dtype)  # d acc_inp
    gg = (dh * a).astype(x_ref.dtype)  # d acc_gate

    dw_inp_acc[...] += jax.lax.dot_general(
        xn, gi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw_gate_acc[...] += jax.lax.dot_general(
        xn, gg, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    dy = jax.lax.dot_general(
        gi, w_inp_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        gg, w_gate_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, K] fp32

    ds_acc[...] += jnp.sum(dy * hn, axis=0, keepdims=True)
    dhn = dy * scale
    dx = rstd * (
        dhn
        - jnp.mean(dhn, axis=-1, keepdims=True)
        - hn * jnp.mean(dhn * hn, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == num_tiles - 1)
    def _finalize():
        dwi_ref[:, : dw_inp_acc.shape[1]] = dw_inp_acc[...].astype(dwi_ref.dtype)
        dwi_ref[:, dw_inp_acc.shape[1]:] = dw_gate_acc[...].astype(dwi_ref.dtype)
        dwo_ref[...] = dwo_acc[...].astype(dwo_ref.dtype)
        dscale_ref[...] = ds_acc[...].astype(dscale_ref.dtype)


def _ln_geglu_wo_bwd_pallas(x2d, ln_scale, wi, wo, g, activation, eps):
    m, k = x2d.shape
    intermediate = wi.shape[1] // 2
    itemsize = jnp.dtype(x2d.dtype).itemsize
    bm = _pick_block_m_tail_bwd(m, k, intermediate, itemsize)
    w_inp = wi[:, :intermediate]
    w_gate = wi[:, intermediate:]
    num_tiles = m // bm
    dx, dwi, dwo, dscale = _pallas_call(
        functools.partial(
            _ln_geglu_wo_bwd_kernel,
            activation=activation, eps=eps, num_tiles=num_tiles,
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
            pl.BlockSpec((k, intermediate), lambda i: (0, 0)),
            pl.BlockSpec((intermediate, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, 2 * intermediate), lambda i: (0, 0)),
            pl.BlockSpec((intermediate, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x2d.dtype),
            jax.ShapeDtypeStruct((k, 2 * intermediate), wi.dtype),
            jax.ShapeDtypeStruct((intermediate, k), wo.dtype),
            jax.ShapeDtypeStruct((1, k), ln_scale.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, intermediate), jnp.float32),
            pltpu.VMEM((k, intermediate), jnp.float32),
            pltpu.VMEM((intermediate, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=16 * m * k * intermediate,
            bytes_accessed=(3 * x2d.size + 3 * wi.size) * itemsize,
            transcendentals=2 * m * intermediate,
        ),
    )(x2d, ln_scale.reshape(1, k), g, w_inp, w_gate, wo)
    return dx, dscale.reshape(ln_scale.shape), dwi, dwo


def _ln_geglu_wo_bwd(activation, eps, residuals, g):
    x2d, ln_scale, wi, wo = residuals
    m, k = x2d.shape
    intermediate = wi.shape[1] // 2
    itemsize = jnp.dtype(x2d.dtype).itemsize
    if (
        os.environ.get("OPEN_PROVENCE_TPU_FUSED_GEGLU_BWD", "1") != "0"
        and _pick_block_m_tail_bwd(m, k, intermediate, itemsize) is not None
    ):
        return _ln_geglu_wo_bwd_pallas(x2d, ln_scale, wi, wo, g, activation, eps)
    _, vjp = jax.vjp(
        lambda x_, s_, wi_, wo_: _ln_geglu_wo_reference(
            x_, s_, wi_, wo_, activation, eps
        ),
        x2d, ln_scale, wi, wo,
    )
    return vjp(g)


fused_ln_geglu_wo.defvjp(_ln_geglu_wo_fwd, _ln_geglu_wo_bwd)


def _ln_matmul_kernel(x_ref, s_ref, w_ref, o_ref, *, eps):
    x = _ln_rows(x_ref[...], s_ref[...], eps)
    acc = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_block_m_matmul(m: int, k: int, n: int, itemsize: int) -> int | None:
    weights = k * n * itemsize
    for bm in (512, 256, 128):
        if m % bm != 0:
            continue
        acc = bm * n * 4
        x_tile = bm * k * itemsize
        out = bm * n * itemsize
        if weights + acc + 2 * (x_tile + out) <= _VMEM_BUDGET:
            return bm
    return None


def ln_matmul_supported(m: int, k: int, n: int, itemsize: int = 2) -> bool:
    return (
        k % 128 == 0
        and n % 128 == 0
        and _pick_block_m_matmul(m, k, n, itemsize) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ln_matmul(
    x2d: jnp.ndarray, ln_scale: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm(x2d)·scale [M, K] @ w [K, N] → [M, N] in one kernel.

    Used for attn_norm→Wqkv: folding the norm into the projection's row
    tiles removes one full read+write of the [M, K] hidden state per layer
    (profiled 0.077 ms/layer at B=32, S=512, base)."""
    return _ln_matmul_forward(x2d, ln_scale, w, eps)


def _ln_matmul_forward(x2d, ln_scale, w, eps):
    m, k = x2d.shape
    n = w.shape[1]
    itemsize = jnp.dtype(x2d.dtype).itemsize
    bm = _pick_block_m_matmul(m, k, n, itemsize)
    if bm is None:
        raise ValueError(f"fused_ln_matmul unsupported for M={m} K={k} N={n}")
    return _pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(x2d.size + w.size + m * n) * itemsize,
            transcendentals=0,
        ),
    )(x2d, ln_scale.reshape(1, k), w)


def _ln_matmul_reference(x2d, ln_scale, w, eps):
    from .layer_norm import layer_norm_reference

    y = layer_norm_reference(x2d, ln_scale, None, eps)
    return jnp.dot(y, w, preferred_element_type=jnp.float32).astype(x2d.dtype)


def _ln_matmul_fwd(x2d, ln_scale, w, eps):
    return _ln_matmul_forward(x2d, ln_scale, w, eps), (x2d, ln_scale, w)


def _pick_block_m_matmul_bwd(m: int, k: int, n: int, itemsize: int) -> int | None:
    if k % 128 != 0 or n % 128 != 0:
        return None
    resident = k * n * itemsize + k * n * 4  # weights + fp32 dW accumulator
    for bm in (256, 128):
        if m % bm != 0:
            continue
        tiles = 2 * bm * (2 * k + n) * itemsize
        acc = bm * n * 4 + bm * k * 4
        if resident + tiles + acc <= _VMEM_BUDGET:
            return bm
    return None


def _ln_matmul_bwd_kernel(
    x_ref, s_ref, g_ref, w_ref,
    dx_ref, dw_ref, dscale_ref,
    dw_acc, ds_acc,
    *, eps, num_tiles,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        ds_acc[...] = jnp.zeros_like(ds_acc)

    x = x_ref[...].astype(jnp.float32)
    scale = s_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    h = (x - mean) * rstd
    xn = (h * scale).astype(x_ref.dtype)

    gt = g_ref[...]
    dw_acc[...] += jax.lax.dot_general(
        xn, gt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy = jax.lax.dot_general(
        gt, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_acc[...] += jnp.sum(dy * h, axis=0, keepdims=True)
    dh = dy * scale
    dx = rstd * (
        dh
        - jnp.mean(dh, axis=-1, keepdims=True)
        - h * jnp.mean(dh * h, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == num_tiles - 1)
    def _finalize():
        dw_ref[...] = dw_acc[...].astype(dw_ref.dtype)
        dscale_ref[...] = ds_acc[...].astype(dscale_ref.dtype)


def _ln_matmul_bwd_pallas(x2d, ln_scale, w, g, eps):
    m, k = x2d.shape
    n = w.shape[1]
    itemsize = jnp.dtype(x2d.dtype).itemsize
    bm = _pick_block_m_matmul_bwd(m, k, n, itemsize)
    num_tiles = m // bm
    dx, dw, dscale = _pallas_call(
        functools.partial(_ln_matmul_bwd_kernel, eps=eps, num_tiles=num_tiles),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x2d.dtype),
            jax.ShapeDtypeStruct((k, n), w.dtype),
            jax.ShapeDtypeStruct((1, k), ln_scale.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, n), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k * n,
            bytes_accessed=(2 * x2d.size + g.size + 2 * w.size) * itemsize,
            transcendentals=0,
        ),
    )(x2d, ln_scale.reshape(1, k), g, w)
    return dx, dscale.reshape(ln_scale.shape), dw


def _ln_matmul_bwd(eps, residuals, g):
    x2d, ln_scale, w = residuals

    m, k = x2d.shape
    if (
        os.environ.get("OPEN_PROVENCE_TPU_FUSED_GEGLU_BWD", "1") != "0"
        and _pick_block_m_matmul_bwd(m, k, w.shape[1],
                                     jnp.dtype(x2d.dtype).itemsize) is not None
    ):
        return _ln_matmul_bwd_pallas(x2d, ln_scale, w, g, eps)
    _, vjp = jax.vjp(
        lambda x_, s_, w_: _ln_matmul_reference(x_, s_, w_, eps), x2d, ln_scale, w
    )
    return vjp(g)


fused_ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)
