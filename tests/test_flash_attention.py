"""Pallas flash-attention parity vs the XLA reference path, run on CPU via
interpret mode: global and sliding-window layers, padding masks, and the
custom_vjp gradient path."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from open_provence_tpu.ops.attention import attention_bias, xla_attention
from open_provence_tpu.ops.flash_attention import flash_attention, pallas_shapes_supported


def _rand_qkv(batch=2, heads=2, seq=256, dim=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    shape = (batch, heads, seq, dim)
    q = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    k = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    v = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    return q, k, v


def test_shapes_supported():
    assert pallas_shapes_supported((2, 2, 256, 64))
    assert not pallas_shapes_supported((2, 2, 200, 64))
    assert not pallas_shapes_supported((2, 2, 256, 48))
    assert not pallas_shapes_supported((2, 256, 64))


@pytest.mark.parametrize("window", [None, 32])
@pytest.mark.parametrize("padded", [False, True])
def test_flash_matches_xla(window, padded):
    q, k, v = _rand_qkv()
    seq = q.shape[2]
    padding_mask = None
    if padded:
        padding_mask = np.ones((q.shape[0], seq), dtype=np.int32)
        padding_mask[0, 200:] = 0
        padding_mask[1, 128:] = 0
        padding_mask = jnp.asarray(padding_mask)

    with pltpu.force_tpu_interpret_mode():
        out_flash = flash_attention(q, k, v, padding_mask=padding_mask, window=window)
    bias = attention_bias(padding_mask, seq, window, dtype=jnp.float32)
    out_ref = xla_attention(q, k, v, bias)

    flash_np = np.asarray(out_flash)
    ref_np = np.asarray(out_ref)
    if padding_mask is not None:
        valid = np.asarray(padding_mask, dtype=bool)
        flash_np = flash_np * valid[:, None, :, None]
        ref_np = ref_np * valid[:, None, :, None]
    np.testing.assert_allclose(flash_np, ref_np, atol=2e-5, rtol=2e-5)


def test_flash_bf16_matches_xla_loosely():
    q, k, v = _rand_qkv(dtype=jnp.bfloat16, seq=128)
    with pltpu.force_tpu_interpret_mode():
        out_flash = flash_attention(q, k, v, padding_mask=None, window=None)
    out_ref = xla_attention(q, k, v, None)
    np.testing.assert_allclose(
        np.asarray(out_flash, dtype=np.float32),
        np.asarray(out_ref, dtype=np.float32),
        atol=3e-2,
    )


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
@pytest.mark.parametrize("padded", [False, True])
def test_flash_gradient_via_custom_vjp(bwd_impl, padded, monkeypatch):
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FLASH_BWD", bwd_impl)
    q, k, v = _rand_qkv(seq=128)
    padding_mask = None
    if padded:
        pm = np.ones((q.shape[0], 128), dtype=np.int32)
        pm[0, 100:] = 0
        padding_mask = jnp.asarray(pm)

    # Sum the loss over VALID query rows only (like the real model's masked
    # losses): fully-masked rows are a documented primal divergence between
    # the guarded flash forward (zeros) and XLA softmax (uniform).
    row_weight = (
        padding_mask[:, None, :, None].astype(jnp.float32)
        if padding_mask is not None
        else 1.0
    )

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, padding_mask=padding_mask, window=16)
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    def loss_ref(q, k, v):
        bias = attention_bias(padding_mask, q.shape[2], 16, dtype=jnp.float32)
        out = xla_attention(q, k, v, bias)
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("window", [None, 32])
def test_flash_fused_rope_matches_external(window):
    """In-kernel rotary must equal apply_rotary + attention."""
    from open_provence_tpu.ops.rotary import apply_rotary, rope_tables

    q, k, v = _rand_qkv(seq=128)
    cos, sin = rope_tables(128, 64, 10000.0)
    with pltpu.force_tpu_interpret_mode():
        fused = flash_attention(
            q, k, v, padding_mask=None, window=window, rope=(cos, sin)
        )
    q_rot, k_rot = apply_rotary(q, k, cos, sin)
    bias = attention_bias(None, 128, window, dtype=jnp.float32)
    expected = xla_attention(q_rot, k_rot, v, bias)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(expected), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
@pytest.mark.parametrize("window", [None, 16])
def test_flash_fused_rope_gradient(bwd_impl, window, monkeypatch):
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FLASH_BWD", bwd_impl)
    from open_provence_tpu.ops.rotary import apply_rotary, rope_tables

    q, k, v = _rand_qkv(seq=128)
    cos, sin = rope_tables(128, 64, 160000.0)

    def loss_flash(q, k, v):
        out = flash_attention(
            q, k, v, padding_mask=None, window=window, rope=(cos, sin)
        )
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        q_rot, k_rot = apply_rotary(q, k, cos, sin)
        bias = attention_bias(None, 128, window, dtype=jnp.float32)
        out = xla_attention(q_rot, k_rot, v, bias)
        return (out.astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_flash_rejects_unaligned():
    q, k, v = _rand_qkv(seq=200)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, padding_mask=None, window=None)


def _rand_packed(batch=2, seq=256, heads=4, dim=64, seed=3, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(batch, seq, 3 * heads * dim)), dtype=dtype)


@pytest.mark.parametrize("window", [None, 32])
@pytest.mark.parametrize("padded", [False, True])
def test_packed_matches_xla(window, padded):
    """Packed-QKV kernel vs the unpacked XLA reference (opt-in TPU path)."""
    from open_provence_tpu.ops.flash_attention import (
        _xla_reference_packed,
        flash_attention_packed,
    )
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D = 2, 256, 4, 64
    qkv = _rand_packed(B, S, H, D)
    cos, sin = rope_tables(S, D, 10000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    pm = None
    if padded:
        m = np.ones((B, S), np.int32)
        m[0, 200:] = 0
        pm = jnp.asarray(m)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_packed(
            qkv, num_heads=H, padding_mask=pm, window=window, rope=(cos, sin)
        )
    ref = _xla_reference_packed(qkv, H, pm, rope_arr, window)
    out_np, ref_np = np.asarray(out), np.asarray(ref)
    if pm is not None:
        valid = np.asarray(pm, bool)[:, :, None]
        out_np, ref_np = out_np * valid, ref_np * valid
    np.testing.assert_allclose(out_np, ref_np, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
@pytest.mark.parametrize("padded", [False, True])
def test_packed_gradient(bwd_impl, padded, monkeypatch):
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FLASH_BWD", bwd_impl)
    from open_provence_tpu.ops.flash_attention import (
        _xla_reference_packed,
        flash_attention_packed,
    )
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D = 2, 128, 4, 64
    qkv = _rand_packed(B, S, H, D, seed=4)
    cos, sin = rope_tables(S, D, 160000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    pm = None
    row_weight = 1.0
    if padded:
        m = np.ones((B, S), np.int32)
        m[0, 100:] = 0
        pm = jnp.asarray(m)
        row_weight = pm[:, :, None].astype(jnp.float32)

    def loss_flash(x):
        out = flash_attention_packed(
            x, num_heads=H, padding_mask=pm, window=16, rope=(cos, sin)
        )
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    def loss_ref(x):
        out = _xla_reference_packed(x, H, pm, rope_arr, 16)
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


# Pairwise-complete selection over (subs x window x oneout): every value of
# each factor meets every value of the others at least once; the full
# 12-case cross took ~2 min of the fast tier's budget for no extra paths.
@pytest.mark.parametrize(
    "subs,window,oneout",
    [
        ("64,64", None, False),
        ("64,64", 32, True),
        ("128,64", None, True),
        ("128,64", 32, False),
        ("64,128", None, False),
        ("64,128", 32, True),
    ],
)
def test_fused_backward_subtiles(window, subs, oneout, monkeypatch):
    """The fused one-pass backward with sub-tiles smaller than S: exercises
    multi-tile dq/dk/dv accumulation and (for windowed layers) the static
    band-skip of out-of-band tiles — the exact code path the
    OPEN_PROVENCE_TPU_BWD_FUSED_SUB sweep tunes."""
    monkeypatch.setenv("OPEN_PROVENCE_TPU_BWD_FUSED_SUB", subs)
    monkeypatch.setenv(
        "OPEN_PROVENCE_TPU_BWD_FUSED_ONEOUT", "1" if oneout else "0"
    )
    from open_provence_tpu.ops.flash_attention import (
        _fused_bwd_sub_blocks,
        _xla_reference_packed,
        flash_attention_packed,
    )
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D = 2, 256, 4, 64
    sub = _fused_bwd_sub_blocks(S, window)
    assert sub == tuple(int(x) for x in subs.split(","))
    qkv = _rand_packed(B, S, H, D, seed=11)
    cos, sin = rope_tables(S, D, 160000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    m = np.ones((B, S), np.int32)
    m[0, 190:] = 0
    pm = jnp.asarray(m)
    row_weight = pm[:, :, None].astype(jnp.float32)

    def loss_flash(x):
        out = flash_attention_packed(
            x, num_heads=H, padding_mask=pm, window=window, rope=(cos, sin)
        )
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash)(qkv)
    g2 = _subtile_reference_grad(window)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


@functools.lru_cache(maxsize=None)
def _subtile_reference_grad(window):
    """XLA reference gradient for test_fused_backward_subtiles: identical for
    every (subs, oneout) case of the same window, so compute it once."""
    from open_provence_tpu.ops.flash_attention import _xla_reference_packed
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D = 2, 256, 4, 64
    qkv = _rand_packed(B, S, H, D, seed=11)
    cos, sin = rope_tables(S, D, 160000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    m = np.ones((B, S), np.int32)
    m[0, 190:] = 0
    pm = jnp.asarray(m)
    row_weight = pm[:, :, None].astype(jnp.float32)

    def loss_ref(x):
        out = _xla_reference_packed(x, H, pm, rope_arr, window)
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    return np.asarray(jax.grad(loss_ref)(qkv))


def test_packed_band_table_multi_offset():
    """Sliding window with several k-blocks per q-block: exercises the
    block-Toeplitz band-bias table (n_off > 1) and band skipping."""
    from open_provence_tpu.ops.flash_attention import (
        _band_bias_table,
        _xla_reference_packed,
        flash_attention_packed,
    )
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D, W = 2, 512, 4, 64, 64
    table, min_off, stride = _band_bias_table(S, 128, 128, W)
    assert table.shape[0] > 1  # genuinely multi-offset
    assert stride == 128

    qkv = _rand_packed(B, S, H, D)
    cos, sin = rope_tables(S, D, 10000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    m = np.ones((B, S), np.int32)
    m[0, 400:] = 0
    pm = jnp.asarray(m)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_packed(
            qkv, num_heads=H, padding_mask=pm, window=W, rope=(cos, sin),
            block_q=128, block_k=128,
        )
    ref = _xla_reference_packed(qkv, H, pm, rope_arr, W)
    valid = np.asarray(pm, bool)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=2e-5
    )


def test_band_bias_table_values():
    from open_provence_tpu.ops.flash_attention import _NEG_INF, _band_bias_table

    S, bq, bk, W = 256, 64, 64, 32
    table, min_off, stride = _band_bias_table(S, bq, bk, W)
    table = np.asarray(table)
    # Every (qi, kj) pair in the banded loop must match the direct formula.
    for qi in range(S // bq):
        q_start = qi * bq
        k_lo = max(0, (q_start - W) // bk)
        k_hi = min(S // bk, (q_start + bq - 1 + W) // bk + 1)
        for kj in range(k_lo, k_hi):
            t = (qi * bq - kj * bk - min_off) // stride
            rows = np.arange(bq)[:, None] + q_start
            cols = np.arange(bk)[None, :] + kj * bk
            expect = np.where(np.abs(rows - cols) <= W, 0.0, _NEG_INF)
            np.testing.assert_array_equal(table[t], expect, err_msg=f"{qi},{kj}")


def test_banded_kernel_parity_and_policy(monkeypatch):
    """The static banded windowed kernel (OPEN_PROVENCE_TPU_BANDED=1) must
    match the grid-level kernel on valid rows, including lse for training."""
    from open_provence_tpu.ops.flash_attention import (
        _flash_forward_packed,
        banded_sub_blocks,
    )
    from open_provence_tpu.ops.rotary import rope_tables

    monkeypatch.setenv("OPEN_PROVENCE_TPU_BANDED", "1")
    # Policy: one-q-program case, ≤50% band coverage, S within VMEM cap.
    assert banded_sub_blocks(1024, 1024, 64) == (128, 256)
    assert banded_sub_blocks(2048, 2048, 64) == (128, 256)
    assert banded_sub_blocks(512, 512, 64) is None    # coverage 75% > 50%
    assert banded_sub_blocks(2048, 2048, None) is None
    assert banded_sub_blocks(2048, 512, 64) is None   # multi-program grid
    assert banded_sub_blocks(8192, 8192, 64) is None  # VMEM cap
    monkeypatch.setenv("OPEN_PROVENCE_TPU_BANDED", "0")
    assert banded_sub_blocks(2048, 2048, 64) is None
    monkeypatch.setenv("OPEN_PROVENCE_TPU_BANDED", "1")

    B, S, H, D, W = 1, 1024, 4, 64, 64
    qkv = _rand_packed(B, S, H, D)
    cos, sin = rope_tables(S, D, 10000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    m = np.ones((B, S), np.int32)
    m[0, 900:] = 0
    pm = jnp.asarray(m)

    def run(banded):
        monkeypatch.setenv("OPEN_PROVENCE_TPU_BANDED", "1" if banded else "0")
        with pltpu.force_tpu_interpret_mode():
            return _flash_forward_packed(
                qkv, H, pm, rope_arr, W, S, 256, emit_lse=True
            )

    o_b, lse_b = run(True)
    o_g, lse_g = run(False)
    valid = np.asarray(pm, bool)
    o_diff = np.abs(np.asarray(o_b) - np.asarray(o_g)).max(axis=-1)
    assert o_diff[valid].max() < 2e-5  # padded rows are don't-care
    # lse layout is grouped rows [B, G, h_block, S] (S on lanes) since r5;
    # both calls use the same h_block so the layouts match elementwise.
    B, S = valid.shape
    lse_diff = (
        np.abs(np.asarray(lse_b) - np.asarray(lse_g))
        .reshape(B, -1, S)
        .transpose(0, 2, 1)  # [B, S, H]
    )
    assert lse_diff[valid].max() < 2e-5


@pytest.mark.slow
def test_banded_forward_grid_backward_gradient(monkeypatch):
    """With the banded promotion active (block_q == S), the backward must
    re-pick grid-friendly blocks — gradients still match the XLA reference."""
    monkeypatch.setenv("OPEN_PROVENCE_TPU_FLASH_BWD", "pallas")
    monkeypatch.setenv("OPEN_PROVENCE_TPU_BANDED", "1")
    from open_provence_tpu.ops.flash_attention import (
        _xla_reference_packed,
        banded_sub_blocks,
        flash_attention_packed,
    )
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D, W = 1, 1024, 2, 64, 64
    assert banded_sub_blocks(S, S, W) is not None
    qkv = _rand_packed(B, S, H, D, seed=5)
    cos, sin = rope_tables(S, D, 10000.0)
    rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)])
    m = np.ones((B, S), np.int32)
    m[0, 1000:] = 0
    pm = jnp.asarray(m)
    row_weight = pm[:, :, None].astype(jnp.float32)

    def loss_flash(x):
        out = flash_attention_packed(
            x, num_heads=H, padding_mask=pm, window=W, rope=(cos, sin)
        )
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    def loss_ref(x):
        out = _xla_reference_packed(x, H, pm, rope_arr, W)
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("window", [None, 64])
def test_bwd_pipeline_variant_bit_identical(window, monkeypatch):
    """OPEN_PROVENCE_TPU_BWD_PIPELINE reorders the fused backward's issue
    schedule (2-stage software pipeline) without changing any op or any
    per-accumulator order — gradients must be BIT-identical to the serial
    body."""
    from open_provence_tpu.ops.flash_attention import flash_attention_packed
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, D = 2, 256, 4, 64
    qkv = _rand_packed(B, S, H, D, seed=13)
    cos, sin = rope_tables(S, D, 160000.0)
    m = np.ones((B, S), np.int32)
    m[0, 200:] = 0
    pm = jnp.asarray(m)
    row_weight = pm[:, :, None].astype(jnp.float32)

    def loss_flash(x):
        out = flash_attention_packed(
            x, num_heads=H, padding_mask=pm, window=window, rope=(cos, sin)
        )
        return ((out.astype(jnp.float32) * row_weight) ** 2).sum()

    def grad_with(pipeline):
        monkeypatch.setenv(
            "OPEN_PROVENCE_TPU_BWD_PIPELINE", "1" if pipeline else "0"
        )
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(jax.grad(loss_flash)(qkv))

    g_serial = grad_with(False)
    g_pipelined = grad_with(True)
    np.testing.assert_array_equal(g_serial, g_pipelined)
