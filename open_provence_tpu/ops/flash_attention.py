"""Pallas TPU flash attention with sliding-window band skipping.

This is the TPU-native counterpart of the reference's optional
flash-attention path (modeling_open_provence_standalone.py:1594-1607, which
opportunistically enables CUDA flash-attn 2). ModernBERT alternates
local(±window)/global attention; for local layers the kernel iterates only
over key blocks inside the band, so compute scales O(S·window) instead of
O(S²) — the win grows with sequence length (8192-token ModernBERT context).

Layout: q/k/v are [B, H, S, D]. Grid is (B, H, num_q_blocks); each program
streams key blocks for its query block with an online-softmax accumulator in
VMEM scratch. Scores are accumulated in fp32 (parity with the reference's
fp32 softmax), output is cast back to the input dtype.

Training: the op carries a ``jax.custom_vjp`` whose backward runs two
Pallas kernels (dq; dk/dv) using the standard flash-attention-2 recipe —
the forward additionally emits per-row log-sum-exp, the backward recomputes
P = exp(S − LSE) blockwise and never materializes S² probabilities. Set
OPEN_PROVENCE_TPU_FLASH_BWD=xla to fall back to an XLA recompute backward.
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

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = float(jnp.finfo(jnp.float32).min)


def pick_block_sizes(seq_len: int, window: int | None) -> tuple[int, int]:
    """Measured on v5e (ModernBERT-base): bigger blocks amortize per-program
    overhead — bq=bk=512 gives 327 pairs/s at S=512 vs 233 at 128-blocks.
    Local (windowed) layers cap k-blocks at 256 so band skipping keeps
    paying at long S (each q block touches ~(2·window/block_k + 2) blocks)."""

    def largest_divisor(cap: int) -> int:
        for cand in (512, 256, 128):
            if cand <= cap and seq_len % cand == 0:
                return cand
        return 128

    block_q = largest_divisor(512)
    # The smaller local-layer k block only pays once the band (±window) is
    # much narrower than the sequence; at short S the loop overhead loses.
    local_cap = 256 if seq_len > 1024 else 512
    block_k = largest_divisor(512 if window is None else local_cap)
    return block_q, block_k


def pallas_shapes_supported(shape: tuple[int, ...], block_q: int = DEFAULT_BLOCK_Q) -> bool:
    """True when [B, H, S, D] is tile-aligned for the kernel."""
    if len(shape) != 4:
        return False
    _, _, seq_len, head_dim = shape
    return (
        seq_len % block_q == 0
        and seq_len >= block_q
        and head_dim in (32, 64, 128, 256)
    )


def _rotate_half_block(x, sign):
    """rotate_half via lane roll: concat(-x2, x1) == roll(x, D/2) * sign.

    Mosaic only implements lane rotation for 32-bit data, so bf16 inputs
    round-trip through fp32 (lossless for bf16 values)."""
    rolled = pltpu.roll(
        x.astype(jnp.float32), shift=x.shape[-1] // 2, axis=x.ndim - 1
    )
    return rolled.astype(x.dtype) * sign


def _rot_half_matrix(head_dim: int, dtype):
    """[D, D] constant P with ``x @ P == rotate_half(x) == concat(-x2, x1)``.

    Moves the rotate-half lane shuffle onto the MXU: the fp32 lane-roll
    round-trip (`_rotate_half_block`) measured ~30% of packed-kernel time at
    B=32, S=512 (0.25 ms/layer of 0.83), while the permutation matmul is
    ~2M MACs per [512, 64] apply — noise on an otherwise idle MXU. Every
    output column is exactly ±one input element, so the matmul is exact in
    any accumulation dtype."""
    row = jax.lax.broadcasted_iota(jnp.int32, (head_dim, head_dim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (head_dim, head_dim), 1)
    half = head_dim // 2
    plus = (col == row + half).astype(dtype)   # y2 =  x1
    minus = (row == col + half).astype(dtype)  # y1 = -x2
    return plus - minus


def _rot_half_matrix_pair(head_dim: int, dtype):
    """Block-diagonal [2D, 2D] rotate-half matrix: applies `_rot_half_matrix`
    independently to each head of a lane pair, so rope runs on full
    128-lane [bq, 2D] tiles (half-width [bq, D] VPU ops waste half the
    lanes — pair-level rope measured ~2x cheaper)."""
    dim = 2 * head_dim
    row = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (dim, dim), 1)
    same = (row // head_dim) == (col // head_dim)
    r_in = row % head_dim
    c_in = col % head_dim
    half = head_dim // 2
    plus = (same & (c_in == r_in + half)).astype(dtype)
    minus = (same & (r_in == c_in + half)).astype(dtype)
    return plus - minus


def _col_to_row(col: jnp.ndarray) -> jnp.ndarray:
    """[N, 1] -> [1, N] via a 1x1 contraction.

    The lse/delta rows are stored with S on LANES (see _flash_forward_packed);
    a degenerate jnp.transpose([N, 1]) is a sublane<->lane relayout Mosaic may
    lower poorly, while this contraction is a plain (tiny) matmul."""
    return jax.lax.dot_general(
        jnp.ones((1, 1), col.dtype), col, (((1,), (1,)), ((), ())),
        preferred_element_type=col.dtype,
    )


def _row_to_col(row: jnp.ndarray) -> jnp.ndarray:
    """[1, N] -> [N, 1]; inverse of _col_to_row, same rationale."""
    return jax.lax.dot_general(
        row, jnp.ones((1, 1), row.dtype), (((0,), (1,)), ((), ())),
        preferred_element_type=row.dtype,
    )


def _band_bias_table(seq_len, block_q, block_k, window):
    """Precomputed additive window bias, block-Toeplitz-compressed.

    The [bq, bk] band bias for grid cell (qi, kj) depends only on
    ``o = qi*block_q - kj*block_k``, so one tiny [n_off, bq, bk] fp32 table
    covers every program — built once in XLA and kept in VMEM, replacing the
    in-kernel iota/compare/where construction (measured ~0.19 ms/layer at
    B=32, S=512). Returns (table, min_off, stride)."""
    n_q = seq_len // block_q
    n_k = seq_len // block_k
    offs = set()
    for qi in range(n_q):
        q_start = qi * block_q
        q_end = q_start + block_q - 1
        k_lo = max(0, (q_start - window) // block_k)
        k_hi = min(n_k, (q_end + window) // block_k + 1)
        for kj in range(k_lo, k_hi):
            offs.add(qi * block_q - kj * block_k)
    stride = math.gcd(block_q, block_k)
    min_off, max_off = min(offs), max(offs)
    n_off = (max_off - min_off) // stride + 1
    t = jax.lax.broadcasted_iota(jnp.int32, (n_off, block_q, block_k), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (n_off, block_q, block_k), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_off, block_q, block_k), 2)
    o = min_off + t * stride
    valid = jnp.abs(r + o - c) <= window
    return jnp.where(valid, 0.0, _NEG_INF), min_off, stride


def _apply_rope_mx(x, cos, sin, rot_p):
    """x·cos + rotate_half(x)·sin with the rotation as an MXU matmul.

    Mosaic requires 32-bit matmul accumulation; the downcast is lossless
    because each output element is exactly ±one bf16 input."""
    rot = jax.lax.dot_general(
        x, rot_p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return x * cos + rot * sin


def _rope_adjoint_mx(g, cos, sin, rot_p):
    """Adjoint of ``_apply_rope_mx``: g·cos − rotate_half(g·sin)."""
    rot = jax.lax.dot_general(
        g * sin, rot_p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(g.dtype)
    return g * cos - rot


def _flash_kernel(
    q_ref,  # [1, h_block, block_q, D]
    k_ref,  # [1, h_block, S, D]
    v_ref,  # [1, h_block, S, D]
    mask_ref,  # [1, 1, S] int32 (1 = valid)
    rope_ref,  # [2, S, D] cos/sin in the activation dtype (rotary fused in)
    o_ref,  # [1, h_block, block_q, D]
    *maybe_lse,  # optional lse_ref [1, h_block, block_q, 1] fp32 (training)
    seq_len: int,
    block_q: int,
    block_k: int,
    h_block: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
):
    lse_ref = maybe_lse[0] if maybe_lse else None
    # Several heads per program (statically unrolled): per-program launch
    # overhead dominated the per-(b,h) grid — measured 4x fewer programs
    # cuts attention-core time substantially on v5e.
    qi = pl.program_id(2)
    scale_is_pow2 = float(scale) != 0.0 and (abs(scale) == 2.0 ** round(
        math.log2(abs(scale))
    ))

    num_k_blocks = seq_len // block_k
    if window is None:
        k_lo = 0
        k_hi = num_k_blocks
    else:
        # Query rows span [qi*bq, (qi+1)*bq); keys within ±window.
        q_start = qi * block_q
        q_end = q_start + block_q - 1
        k_lo = jnp.maximum(0, (q_start - window) // block_k)
        k_hi = jnp.minimum(num_k_blocks, (q_end + window) // block_k + 1)

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
    )

    head_dim = q_ref.shape[-1]
    if has_rope:
        half_sign = jnp.concatenate(
            [
                jnp.full((1, head_dim // 2), -1.0, dtype=q_ref.dtype),
                jnp.ones((1, head_dim // 2), dtype=q_ref.dtype),
            ],
            axis=-1,
        )
        rope_cos_q = rope_ref[0, pl.ds(qi * block_q, block_q), :]
        rope_sin_q = rope_ref[1, pl.ds(qi * block_q, block_q), :]

    def head_body(h, _):
        # Keep q in its input dtype (bf16 on TPU): the MXU takes
        # low-precision inputs with fp32 accumulation. A power-of-two
        # softmax scale folds losslessly into q.
        q = q_ref[0, h]  # [bq, D]
        if has_rope:
            q = q * rope_cos_q + _rotate_half_block(q, half_sign) * rope_sin_q
        if scale_is_pow2:
            q = q * jnp.asarray(scale, dtype=q.dtype)

        def body(kj, carry):
            m_prev, l_prev, acc_prev = carry
            k_off = kj * block_k
            k = k_ref[0, h, pl.ds(k_off, block_k), :]  # [bk, D] input dtype
            v = v_ref[0, h, pl.ds(k_off, block_k), :]
            if has_rope:
                cos_k = rope_ref[0, pl.ds(k_off, block_k), :]
                sin_k = rope_ref[1, pl.ds(k_off, block_k), :]
                k = k * cos_k + _rotate_half_block(k, half_sign) * sin_k

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [bq, bk] fp32
            if not scale_is_pow2:
                s = s * scale

            col_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_off
            )
            if window is not None:
                dist = jnp.abs(row_ids - col_ids)
                s = jnp.where(dist <= window, s, _NEG_INF)
            if has_mask:
                kmask = mask_ref[0, 0, pl.ds(k_off, block_k)]  # [bk]
                s = jnp.where((kmask > 0)[None, :], s, _NEG_INF)

            m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)  # [bq, bk] fp32
            alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            # p cast to the value dtype (bf16) for the MXU; fp32 accumulation.
            acc_new = acc_prev * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        init = (
            jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32),
            jnp.zeros((block_q, 1), dtype=jnp.float32),
            jnp.zeros((block_q, head_dim), dtype=jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(k_lo, k_hi, body, init)
        if lse_ref is not None:
            # Fully-masked rows get a +huge sentinel so the backward's
            # exp(s − lse) underflows to exactly 0 for them.
            lse = jnp.where(l == 0.0, -_NEG_INF, m + jnp.log(l))
            lse_ref[0, h] = lse  # [block_q, 1]
        # Guard against fully-masked rows (padding queries): avoid 0/0.
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, h] = (acc / l).astype(o_ref.dtype)
        return 0

    # fori_loop (not a static unroll) so only one head's fp32 working set is
    # live on the VMEM stack at a time.
    jax.lax.fori_loop(0, h_block, head_body, 0)


def _choose_h_block(
    num_heads: int,
    seq_len: int,
    head_dim: int,
    block_q: int,
    itemsize: int,
    row_tile_rows: int = 0,
    even_only: bool = False,
    vmem_budget: int = 10 * 1024 * 1024,
) -> int:
    """Heads per program under the scoped-VMEM budget (see _flash_forward).

    ``row_tile_rows`` counts fp32 rows of [rows, 1] LSE/delta tiles held per
    head; Mosaic pads their lane dim to 128, so each row costs 128·4 bytes
    (doubled for Pallas' double buffering). ``even_only`` restricts to even
    counts (the packed kernels process heads in pairs)."""
    per_head_bytes = 4 * (2 * seq_len * head_dim * itemsize + 2 * block_q * head_dim * 4)
    per_head_bytes += 2 * row_tile_rows * 128 * 4
    h_cap = max(1, vmem_budget // max(per_head_bytes, 1))
    candidates = (8, 6, 4, 2) if even_only else (8, 6, 4, 3, 2, 1)
    for cand in candidates:
        if cand <= h_cap and num_heads % cand == 0:
            return cand
    return 2 if even_only else 1


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    padding_mask: jnp.ndarray | None,
    rope: jnp.ndarray | None,
    window: int | None,
    block_q: int,
    block_k: int,
    emit_lse: bool = False,
):
    batch, num_heads, seq_len, head_dim = q.shape
    scale = head_dim**-0.5
    has_mask = padding_mask is not None
    if padding_mask is None:
        mask_arr = jnp.ones((batch, 1, seq_len), dtype=jnp.int32)
    else:
        mask_arr = padding_mask.astype(jnp.int32).reshape(batch, 1, seq_len)
    has_rope = rope is not None
    if rope is None:
        rope = jnp.zeros((2, seq_len, head_dim), dtype=q.dtype)
    else:
        rope = rope.astype(q.dtype)

    # Heads per program: enough to amortize launch overhead while fitting
    # scoped VMEM (~16 MB) with Pallas' double buffering. Coefficient
    # calibrated against Mosaic's accounting (measured ~2.8 MB/head at
    # S=2048, bq=512, bf16).
    h_block = _choose_h_block(
        num_heads,
        seq_len,
        head_dim,
        block_q,
        jnp.dtype(q.dtype).itemsize,
        row_tile_rows=block_q if emit_lse else 0,
    )

    grid = (batch, num_heads // h_block, seq_len // block_q)
    kernel = functools.partial(
        _flash_kernel,
        seq_len=seq_len,
        block_q=block_q,
        block_k=block_k,
        h_block=h_block,
        window=window,
        scale=scale,
        has_mask=has_mask,
        has_rope=has_rope,
    )
    # Keep K/V in VMEM for typical shapes; extremely long sequences would need
    # a double-buffered HBM variant.
    kv_spec = pl.BlockSpec(
        (1, h_block, seq_len, head_dim), lambda b, h, i: (b, h, 0, 0)
    )
    out = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h_block, block_q, head_dim), lambda b, h, i: (b, h, i, 0)
            ),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, 1, seq_len), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((2, seq_len, head_dim), lambda b, h, i: (0, 0, 0)),
        ],
        out_specs=(
            [
                pl.BlockSpec(
                    (1, h_block, block_q, head_dim), lambda b, h, i: (b, h, i, 0)
                ),
                # LSE rides a trailing singleton dim so the block's last two
                # dims are (block_q, 1) — Mosaic requires the last two block
                # dims be (8,128)-divisible or equal to the array dims, and
                # (h_block, block_q) trailing dims fail that when h_block∉{8k,H}.
                pl.BlockSpec(
                    (1, h_block, block_q, 1), lambda b, h, i: (b, h, i, 0)
                ),
            ]
            if emit_lse
            else pl.BlockSpec(
                (1, h_block, block_q, head_dim), lambda b, h, i: (b, h, i, 0)
            )
        ),
        out_shape=(
            [
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct((batch, num_heads, seq_len, 1), jnp.float32),
            ]
            if emit_lse
            else jax.ShapeDtypeStruct(q.shape, q.dtype)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # The rope-as-matmul rewrite grew the per-head fp32 stack past the
            # 16 MB default scoped-vmem limit at h_block=6; v5e has 128 MB of
            # VMEM, so a 32 MB scope is comfortably safe.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * seq_len * seq_len * head_dim,
            bytes_accessed=q.size * q.dtype.itemsize * 4,
            transcendentals=batch * num_heads * seq_len * seq_len,
        ),
    )(q, k, v, mask_arr, rope)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention_core(q, k, v, mask_arr, rope, window, block_q, block_k):
    padding_mask = mask_arr if mask_arr is not None else None
    return _flash_forward(q, k, v, padding_mask, rope, window, block_q, block_k)


def _xla_reference(q, k, v, mask_arr, rope, window):
    from .attention import attention_bias, xla_attention
    from .rotary import apply_rotary

    if rope is not None:
        q, k = apply_rotary(q, k, rope[0], rope[1])
    bias = attention_bias(mask_arr, q.shape[2], window, dtype=jnp.float32)
    return xla_attention(q, k, v, bias)


def _flash_fwd(q, k, v, mask_arr, rope, window, block_q, block_k):
    padding_mask = mask_arr if mask_arr is not None else None
    out, lse = _flash_forward(
        q, k, v, padding_mask, rope, window, block_q, block_k, emit_lse=True
    )
    return out, (q, k, v, mask_arr, rope, out, lse)


def _apply_rope_block(x, cos, sin, half_sign):
    return x * cos + _rotate_half_block(x, half_sign) * sin


def _rope_adjoint(g, cos, sin, half_sign):
    """Adjoint of x ↦ x·cos + rot_half(x)·sin: g·cos − rot_half(g·sin)."""
    return g * cos - _rotate_half_block(g * sin, half_sign)


def _bwd_dq_kernel(
    q_ref,  # [1, h, bq, D]
    k_ref,  # [1, h, S, D]
    v_ref,  # [1, h, S, D]
    do_ref,  # [1, h, bq, D]
    lse_ref,  # [1, h, bq, 1] fp32 (unpacked path keeps the 4-D layout)
    delta_ref,  # [1, h, bq, 1] fp32
    mask_ref,  # [1, 1, S]
    rope_ref,  # [2, S, D]
    dq_ref,  # [1, h, bq, D]
    *,
    seq_len: int,
    block_q: int,
    block_k: int,
    h_block: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
):
    qi = pl.program_id(2)
    num_k_blocks = seq_len // block_k
    if window is None:
        k_lo, k_hi = 0, num_k_blocks
    else:
        q_start = qi * block_q
        q_end = q_start + block_q - 1
        k_lo = jnp.maximum(0, (q_start - window) // block_k)
        k_hi = jnp.minimum(num_k_blocks, (q_end + window) // block_k + 1)

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
    )
    head_dim = q_ref.shape[-1]
    if has_rope:
        half_sign = jnp.concatenate(
            [
                jnp.full((1, head_dim // 2), -1.0, dtype=q_ref.dtype),
                jnp.ones((1, head_dim // 2), dtype=q_ref.dtype),
            ],
            axis=-1,
        )
        cos_q = rope_ref[0, pl.ds(qi * block_q, block_q), :]
        sin_q = rope_ref[1, pl.ds(qi * block_q, block_q), :]

    def head_body(h, _):
        q = q_ref[0, h]
        if has_rope:
            q = _apply_rope_block(q, cos_q, sin_q, half_sign)
        do = do_ref[0, h]
        lse = lse_ref[0, h]  # [bq, 1] fp32
        delta = delta_ref[0, h]

        def body(kj, acc):
            k_off = kj * block_k
            k = k_ref[0, h, pl.ds(k_off, block_k), :]
            v = v_ref[0, h, pl.ds(k_off, block_k), :]
            if has_rope:
                cos_k = rope_ref[0, pl.ds(k_off, block_k), :]
                sin_k = rope_ref[1, pl.ds(k_off, block_k), :]
                k = _apply_rope_block(k, cos_k, sin_k, half_sign)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            col_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_off
            )
            if window is not None:
                s = jnp.where(jnp.abs(row_ids - col_ids) <= window, s, _NEG_INF)
            if has_mask:
                kmask = mask_ref[0, 0, pl.ds(k_off, block_k)]
                s = jnp.where((kmask > 0)[None, :], s, _NEG_INF)
            p = jnp.exp(s - lse)  # [bq, bk] fp32
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [bq, bk]
            ds = p * (dp - delta)  # fp32
            return acc + jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            k_lo, k_hi, body, jnp.zeros((block_q, head_dim), dtype=jnp.float32)
        )
        dq_rot = acc * scale
        if has_rope:
            dq_rot = _rope_adjoint(
                dq_rot.astype(q_ref.dtype), cos_q, sin_q, half_sign
            )
        dq_ref[0, h] = dq_rot.astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h_block, head_body, 0)


def _bwd_dkv_kernel(
    q_ref,  # [1, h, S, D]
    k_ref,  # [1, h, bk, D]
    v_ref,  # [1, h, bk, D]
    do_ref,  # [1, h, S, D]
    lse_ref,  # [1, h, S, 1] fp32 (unpacked path keeps the 4-D layout)
    delta_ref,  # [1, h, S, 1] fp32
    mask_ref,  # [1, 1, S]
    rope_ref,  # [2, S, D]
    dk_ref,  # [1, h, bk, D]
    dv_ref,  # [1, h, bk, D]
    *,
    seq_len: int,
    block_q: int,
    block_k: int,
    h_block: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
):
    kj = pl.program_id(2)
    k_off = kj * block_k
    num_q_blocks = seq_len // block_q
    if window is None:
        q_lo, q_hi = 0, num_q_blocks
    else:
        q_lo = jnp.maximum(0, (k_off - window) // block_q)
        q_hi = jnp.minimum(
            num_q_blocks, (k_off + block_k - 1 + window) // block_q + 1
        )

    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_off
    )
    head_dim = q_ref.shape[-1]
    if has_rope:
        half_sign = jnp.concatenate(
            [
                jnp.full((1, head_dim // 2), -1.0, dtype=q_ref.dtype),
                jnp.ones((1, head_dim // 2), dtype=q_ref.dtype),
            ],
            axis=-1,
        )
        cos_k = rope_ref[0, pl.ds(k_off, block_k), :]
        sin_k = rope_ref[1, pl.ds(k_off, block_k), :]
    if has_mask:
        kmask_block = mask_ref[0, 0, pl.ds(k_off, block_k)]

    def head_body(h, _):
        k = k_ref[0, h]
        if has_rope:
            k = _apply_rope_block(k, cos_k, sin_k, half_sign)
        v = v_ref[0, h]

        def body(qi, carry):
            dk_acc, dv_acc = carry
            q_off = qi * block_q
            q = q_ref[0, h, pl.ds(q_off, block_q), :]
            if has_rope:
                cos_q = rope_ref[0, pl.ds(q_off, block_q), :]
                sin_q = rope_ref[1, pl.ds(q_off, block_q), :]
                q = _apply_rope_block(q, cos_q, sin_q, half_sign)
            do = do_ref[0, h, pl.ds(q_off, block_q), :]
            lse = lse_ref[0, h, pl.ds(q_off, block_q)]  # [bq, 1]
            delta = delta_ref[0, h, pl.ds(q_off, block_q)]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [bq, bk]
            row_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_off
            )
            if window is not None:
                s = jnp.where(jnp.abs(row_ids - col_ids) <= window, s, _NEG_INF)
            if has_mask:
                s = jnp.where((kmask_block > 0)[None, :], s, _NEG_INF)
            p = jnp.exp(s - lse)  # [bq, bk]
            dv_new = dv_acc + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bk, D]
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [bq, bk]
            ds = p * (dp - delta)
            dk_new = dk_acc + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bk, D]
            return dk_new, dv_new

        zeros = jnp.zeros((block_k, head_dim), dtype=jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(q_lo, q_hi, body, (zeros, zeros))
        dk_rot = dk_acc * scale
        if has_rope:
            dk_rot = _rope_adjoint(
                dk_rot.astype(k_ref.dtype), cos_k, sin_k, half_sign
            )
        dk_ref[0, h] = dk_rot.astype(dk_ref.dtype)
        dv_ref[0, h] = dv_acc.astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h_block, head_body, 0)


def _flash_backward(q, k, v, mask_arr, rope, out, lse, g, window, block_q, block_k):
    batch, num_heads, seq_len, head_dim = q.shape
    scale = head_dim**-0.5
    has_mask = mask_arr is not None
    mask_in = (
        mask_arr.astype(jnp.int32).reshape(batch, 1, seq_len)
        if has_mask
        else jnp.ones((batch, 1, seq_len), dtype=jnp.int32)
    )
    has_rope = rope is not None
    rope_in = (
        rope.astype(q.dtype)
        if has_rope
        else jnp.zeros((2, seq_len, head_dim), dtype=q.dtype)
    )
    # [B,H,S,1] — trailing singleton keeps the Pallas block dims legal.
    # dO casts to the kernel dtype BEFORE the delta reduce (same reasoning
    # as _flash_backward_packed: self-consistent with the kernel's dp and
    # avoids a full fp32 dO materialization upstream).
    g = g.astype(q.dtype)
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).sum(-1, keepdims=True)

    # The dkv kernel holds full-length [S, 1] LSE+delta tiles per head.
    h_block = _choose_h_block(
        num_heads,
        seq_len,
        head_dim,
        max(block_q, block_k),
        jnp.dtype(q.dtype).itemsize,
        row_tile_rows=2 * seq_len,
    )
    statics = dict(
        seq_len=seq_len,
        block_q=block_q,
        block_k=block_k,
        h_block=h_block,
        window=window,
        scale=scale,
        has_mask=has_mask,
        has_rope=has_rope,
    )
    full_spec = pl.BlockSpec((1, h_block, seq_len, head_dim), lambda b, h, i: (b, h, 0, 0))
    qblk_spec = pl.BlockSpec((1, h_block, block_q, head_dim), lambda b, h, i: (b, h, i, 0))
    kblk_spec = pl.BlockSpec((1, h_block, block_k, head_dim), lambda b, h, i: (b, h, i, 0))
    qrow_spec = pl.BlockSpec(
        (1, h_block, block_q, 1), lambda b, h, i: (b, h, i, 0)
    )
    full_row_spec = pl.BlockSpec(
        (1, h_block, seq_len, 1), lambda b, h, i: (b, h, 0, 0)
    )
    mask_spec = pl.BlockSpec((1, 1, seq_len), lambda b, h, i: (b, 0, 0))
    rope_spec = pl.BlockSpec((2, seq_len, head_dim), lambda b, h, i: (0, 0, 0))

    dq = _pallas_call(
        functools.partial(_bwd_dq_kernel, **statics),
        grid=(batch, num_heads // h_block, seq_len // block_q),
        in_specs=[qblk_spec, full_spec, full_spec, qblk_spec, qrow_spec,
                  qrow_spec, mask_spec, rope_spec],
        out_specs=qblk_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # The rope-as-matmul rewrite grew the per-head fp32 stack past the
            # 16 MB default scoped-vmem limit at h_block=6; v5e has 128 MB of
            # VMEM, so a 32 MB scope is comfortably safe.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(q, k, v, g, lse, delta, mask_in, rope_in)

    dk, dv = _pallas_call(
        functools.partial(_bwd_dkv_kernel, **statics),
        grid=(batch, num_heads // h_block, seq_len // block_k),
        in_specs=[full_spec, kblk_spec, kblk_spec, full_spec, full_row_spec,
                  full_row_spec, mask_spec, rope_spec],
        out_specs=[kblk_spec, kblk_spec],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # The rope-as-matmul rewrite grew the per-head fp32 stack past the
            # 16 MB default scoped-vmem limit at h_block=6; v5e has 128 MB of
            # VMEM, so a 32 MB scope is comfortably safe.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(q, k, v, g, lse, delta, mask_in, rope_in)
    return dq, dk, dv


def _flash_bwd(window, block_q, block_k, residuals, g):
    q, k, v, mask_arr, rope, out, lse = residuals
    if os.environ.get("OPEN_PROVENCE_TPU_FLASH_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, mask_arr, rope, window),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    else:
        dq, dk, dv = _flash_backward(
            q, k, v, mask_arr, rope, out, lse, g, window, block_q, block_k
        )
    d_rope = None if rope is None else jnp.zeros_like(rope)
    return dq, dk, dv, None, d_rope


_flash_attention_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    padding_mask: jnp.ndarray | None,
    window: int | None,
    rope: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jnp.ndarray:
    """Flash attention on [B, H, S, D]. S must be a multiple of block_q.

    ``rope=(cos, sin)`` ([S, D] each) fuses rotary application into the
    kernel — q/k arrive UNROTATED, saving the separate rotate-half fusion
    and two rotated-array materializations per layer.
    Block sizes default to ``pick_block_sizes`` (seq/window-adaptive)."""
    if block_q is None and block_k is None:
        block_q, block_k = pick_block_sizes(q.shape[2], window)
    block_q = int(block_q or DEFAULT_BLOCK_Q)
    block_k = int(block_k or DEFAULT_BLOCK_K)
    seq_len = q.shape[2]
    if seq_len % block_q != 0 or seq_len % block_k != 0:
        raise ValueError(
            f"flash_attention requires S divisible by block sizes; got "
            f"S={seq_len}, block_q={block_q}, block_k={block_k}"
        )
    if not pallas_shapes_supported(q.shape, min(block_q, 128)):
        raise ValueError(
            f"flash_attention requires S % {block_q} == 0 and head_dim in "
            f"{{32,64,128,256}}; got shape {q.shape}"
        )
    mask_arr = None if padding_mask is None else padding_mask.astype(jnp.int32)
    rope_arr = None
    if rope is not None:
        cos, sin = rope
        rope_arr = jnp.stack([cos.astype(q.dtype), sin.astype(q.dtype)], axis=0)
    return _flash_attention_core(q, k, v, mask_arr, rope_arr, window, block_q, block_k)


# ---------------------------------------------------------------------------
# Packed-QKV path
#
# Consumes the fused Wqkv projection output [B, S, 3·H·D] directly, in the HF
# lane order (qkv, head, dim) — see the reference's fused Wqkv at
# modeling_open_provence_standalone.py:1569-1578. The kernel reads q/k/v as
# lane regions of ONE buffer (the array is passed three times with different
# index maps; XLA keeps a single allocation), so the [B,S,3,H,D]→[B,H,S,D]
# transposes and the output transpose before Wo disappear entirely — those
# copies measured ~16% of forward time at B=32, S=512 on v5e.
#
# Mosaic only lowers dynamic lane offsets that are 128-aligned, so heads are
# processed in pairs (2·head_dim must be a multiple of 128; every ModernBERT
# family uses head_dim=64). Within a pair the two heads share one [·, 128]
# load and are split by static lane slices.
# ---------------------------------------------------------------------------


def pallas_packed_supported(
    batch: int, seq_len: int, num_heads: int, head_dim: int,
    block_q: int = DEFAULT_BLOCK_Q,
) -> bool:
    """True when the packed-QKV kernel can run on [B, S, 3·H·D]."""
    return (
        seq_len % block_q == 0
        and seq_len >= block_q
        and (2 * head_dim) % 128 == 0
        and num_heads % 2 == 0
    )


def _flash_kernel_packed(
    q_ref,  # [1, block_q, h_block·D] — q lane region of the packed buffer
    k_ref,  # [1, S, h_block·D] — k lane region
    v_ref,  # [1, S, h_block·D] — v lane region
    mask_ref,  # [1, 1, S] int32 (1 = valid)
    rope_ref,  # [2, S, D] cos/sin
    *tail,  # [band_ref?], o_ref, [lse_ref?] — band present iff window
    seq_len: int,
    block_q: int,
    block_k: int,
    h_block: int,
    head_dim: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
    band_min_off: int = 0,
    band_stride: int = 1,
):
    band_ref = tail[0] if window is not None else None
    rest = tail[1:] if window is not None else tail
    o_ref = rest[0]
    lse_ref = rest[1] if len(rest) > 1 else None
    qi = pl.program_id(2)
    scale_is_pow2 = float(scale) != 0.0 and (
        abs(scale) == 2.0 ** round(math.log2(abs(scale)))
    )

    num_k_blocks = seq_len // block_k
    if window is None:
        k_lo, k_hi = 0, num_k_blocks
    else:
        q_start = qi * block_q
        q_end = q_start + block_q - 1
        k_lo = jnp.maximum(0, (q_start - window) // block_k)
        k_hi = jnp.minimum(num_k_blocks, (q_end + window) // block_k + 1)

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
    )
    lanes = 2 * head_dim
    if has_rope:
        rot_p2 = _rot_half_matrix_pair(head_dim, q_ref.dtype)
        cos_q = rope_ref[0, pl.ds(qi * block_q, block_q), :]
        sin_q = rope_ref[1, pl.ds(qi * block_q, block_q), :]
        cos_q2 = jnp.concatenate([cos_q, cos_q], axis=-1)  # [bq, 2D]
        sin_q2 = jnp.concatenate([sin_q, sin_q], axis=-1)

    # Loop order: k blocks OUTER (fori), heads INNER (static unroll). One
    # additive bias per k block replaces the per-head window/padding `where`
    # chains — masking was measured at 0.9–1.4 ms/layer at B=32, S=512
    # (~40% of kernel time) when recomputed per head. Padding-only masks use
    # a [1, bk] row bias (broadcast in `s + bias`): materializing the full
    # [bq, bk] fp32 matrix cost ~0.19 ms/layer on global layers. Rope is
    # applied per head PAIR on full 128-lane tiles with a block-diagonal
    # rotation matmul (per-head half-width rope measured 0.23 ms/layer).
    num_pairs = h_block // 2
    qs = []
    for p in range(num_pairs):
        q_pair = q_ref[0, :, p * lanes:(p + 1) * lanes]  # [bq, 2D]
        if has_rope:
            q_pair = _apply_rope_mx(q_pair, cos_q2, sin_q2, rot_p2)
        if scale_is_pow2:
            q_pair = q_pair * jnp.asarray(scale, dtype=q_pair.dtype)
        for sub in range(2):
            qs.append(q_pair[:, sub * head_dim:(sub + 1) * head_dim])

    def kj_body(kj, carry):
        k_off = kj * block_k
        bias = None
        if window is not None:
            t = (qi * block_q - kj * block_k - band_min_off) // band_stride
            bias = band_ref[pl.ds(t, 1), :, :][0]  # [bq, bk] fp32, shared
            if has_mask:
                kmask = mask_ref[0, 0, pl.ds(k_off, block_k)]
                krow = jnp.where(kmask > 0, 0.0, _NEG_INF)[None, :]
                # Clamp: two stacked _NEG_INF adds overflow to -inf, and a
                # fully -inf row would make exp(s - m) NaN.
                bias = jnp.maximum(bias + krow, _NEG_INF)
        elif has_mask:
            kmask = mask_ref[0, 0, pl.ds(k_off, block_k)]
            bias = jnp.where(kmask > 0, 0.0, _NEG_INF)[None, :]  # [1, bk]

        if has_rope:
            cos_k = rope_ref[0, pl.ds(k_off, block_k), :]
            sin_k = rope_ref[1, pl.ds(k_off, block_k), :]
            cos_k2 = jnp.concatenate([cos_k, cos_k], axis=-1)
            sin_k2 = jnp.concatenate([sin_k, sin_k], axis=-1)

        new_carry = []
        for p in range(num_pairs):
            k_pair = k_ref[0, pl.ds(k_off, block_k), p * lanes:(p + 1) * lanes]
            v_pair = v_ref[0, pl.ds(k_off, block_k), p * lanes:(p + 1) * lanes]
            if has_rope:
                k_pair = _apply_rope_mx(k_pair, cos_k2, sin_k2, rot_p2)
            for sub in range(2):
                h = 2 * p + sub
                m_prev, l_prev, acc_prev = carry[3 * h], carry[3 * h + 1], carry[3 * h + 2]
                k = k_pair[:, sub * head_dim:(sub + 1) * head_dim]
                v = v_pair[:, sub * head_dim:(sub + 1) * head_dim]
                s = jax.lax.dot_general(
                    qs[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if not scale_is_pow2:
                    s = s * scale
                if bias is not None:
                    s = s + bias
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p_mat = jnp.exp(s - m_new)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p_mat, axis=-1, keepdims=True)
                acc_new = acc_prev * alpha + jax.lax.dot_general(
                    p_mat.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                new_carry.extend((m_new, l_new, acc_new))
        return tuple(new_carry)

    init = (
        jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32),
        jnp.zeros((block_q, 1), dtype=jnp.float32),
        jnp.zeros((block_q, head_dim), dtype=jnp.float32),
    ) * h_block
    final = jax.lax.fori_loop(k_lo, k_hi, kj_body, init)
    for p in range(num_pairs):
        halves = []
        for sub in range(2):
            h = 2 * p + sub
            m, l = final[3 * h], final[3 * h + 1]
            acc = final[3 * h + 2]
            if lse_ref is not None:
                # With the additive bias, rows whose every key is masked get
                # p ≈ softmax of the raw scores (not exactly 0) — harmless:
                # such rows carry zero upstream gradient in the model, and
                # their outputs are discarded. Rows never visited by the
                # banded loop still have l == 0 and take the sentinel.
                # Layout: lse block is [1, 1, h_block, block_q] with S on
                # LANES — a [.., S, 1] trailing dim lane-pads x128 under TPU
                # tiling, and XLA's fwd→bwd relayout copy of that padding
                # measured ~6.8 ms/step at b64 S512 (22 layers). The [bq, 1]
                # column becomes a [1, bq] row via a 1x1 contraction
                # (_col_to_row) — Mosaic-safe, unlike a degenerate transpose.
                lse = jnp.where(l == 0.0, -_NEG_INF, m + jnp.log(l))
                lse_ref[0, 0, h:h + 1, :] = _col_to_row(lse)
            l = jnp.where(l == 0.0, 1.0, l)
            halves.append((acc / l).astype(o_ref.dtype))
        o_ref[0, :, p * lanes:(p + 1) * lanes] = jnp.concatenate(halves, axis=-1)


def _flash_kernel_packed_banded(
    q_ref,  # [1, block_q, h_block·D] — q lane region of the packed buffer
    k_ref,  # [1, S, h_block·D] — k lane region
    v_ref,  # [1, S, h_block·D] — v lane region
    mask_ref,  # [1, 1, S] int32 (1 = valid)
    rope_ref,  # [2, S, D] cos/sin
    band_ref,  # [n_off, sub_q, sub_k] fp32 Toeplitz band table
    o_ref,  # [1, block_q, h_block·D]
    *maybe_lse,  # optional lse_ref [1, 1, h_block, block_q] fp32 (training)
    seq_len: int,
    block_q: int,
    sub_q: int,
    sub_k: int,
    h_block: int,
    head_dim: int,
    window: int,
    scale: float,
    has_mask: bool,
    has_rope: bool,
    band_min_off: int,
    band_stride: int,
):
    """Windowed-attention kernel with fully-static in-program band skipping.

    Requires ``block_q == seq_len`` (one q program per (batch, head
    group)), which makes every index static: the q sub-block starts, the
    in-band k ranges, and the band-table rows all resolve at trace time,
    so the whole band walk unrolls with zero loop or dynamic-slice
    overhead. The grid-level kernel (``_flash_kernel_packed``) can only
    skip whole ``block_k`` key blocks per q *program*; at S=512 with
    block_q=512 one program spans every row, so nothing skips and local
    layers cost MORE than global ones (profiled 0.66 vs 0.52 ms at
    B=32). Shrinking the grid blocks instead re-pays per-program setup
    (rope, k/v staging) — 1.87 ms/layer at 128-blocks vs 1.04 at 512
    (scripts/perf_flash_block_sweep.py) — and a dynamic-fori sub-block
    variant of this kernel lost ~20% end-to-end. Here k/v stay
    VMEM-resident, k is rope-rotated ONCE per pair, and out-of-band
    tiles skip BOTH the MXU work and the fp32 softmax exps.
    """
    assert block_q == seq_len, "banded kernel requires one q program"
    lse_ref = maybe_lse[0] if maybe_lse else None
    scale_is_pow2 = float(scale) != 0.0 and (
        abs(scale) == 2.0 ** round(math.log2(abs(scale)))
    )
    lanes = 2 * head_dim
    num_pairs = h_block // 2
    num_sk = seq_len // sub_k

    if has_rope:
        rot_p2 = _rot_half_matrix_pair(head_dim, q_ref.dtype)
        cos2 = jnp.concatenate([rope_ref[0]] * 2, axis=-1)  # [S, 2D]
        sin2 = jnp.concatenate([rope_ref[1]] * 2, axis=-1)

    qs, ks, vs = [], [], []
    for p in range(num_pairs):
        q_pair = q_ref[0, :, p * lanes:(p + 1) * lanes]  # [S, 2D]
        k_pair = k_ref[0, :, p * lanes:(p + 1) * lanes]
        if has_rope:
            q_pair = _apply_rope_mx(q_pair, cos2, sin2, rot_p2)
            k_pair = _apply_rope_mx(k_pair, cos2, sin2, rot_p2)
        if scale_is_pow2:
            q_pair = q_pair * jnp.asarray(scale, dtype=q_pair.dtype)
        for sub in range(2):
            qs.append(q_pair[:, sub * head_dim:(sub + 1) * head_dim])
            ks.append(k_pair[:, sub * head_dim:(sub + 1) * head_dim])
            vs.append(v_ref[0, :, p * lanes + sub * head_dim:
                            p * lanes + (sub + 1) * head_dim])

    for sqi in range(seq_len // sub_q):
        q_start = sqi * sub_q
        k_lo = max(0, (q_start - window) // sub_k)
        k_hi = min(num_sk, (q_start + sub_q - 1 + window) // sub_k + 1)

        outs = []
        for h in range(h_block):
            q_sub = qs[h][q_start:q_start + sub_q, :]
            m_run = jnp.full((sub_q, 1), _NEG_INF, dtype=jnp.float32)
            l_run = jnp.zeros((sub_q, 1), dtype=jnp.float32)
            acc = jnp.zeros((sub_q, head_dim), dtype=jnp.float32)
            for kj in range(k_lo, k_hi):
                k_off = kj * sub_k
                t = (q_start - k_off - band_min_off) // band_stride
                bias = band_ref[t]  # [sub_q, sub_k] fp32, static row
                if has_mask:
                    kmask = mask_ref[0, 0, k_off:k_off + sub_k]
                    krow = jnp.where(kmask > 0, 0.0, _NEG_INF)[None, :]
                    # Clamp: two stacked _NEG_INF adds overflow to -inf,
                    # and a fully -inf row would make exp(s - m) NaN.
                    bias = jnp.maximum(bias + krow, _NEG_INF)
                s = jax.lax.dot_general(
                    q_sub, ks[h][k_off:k_off + sub_k, :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if not scale_is_pow2:
                    s = s * scale
                s = s + bias
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_run, m_cur)
                p_mat = jnp.exp(s - m_new)
                alpha = jnp.exp(m_run - m_new)
                l_run = l_run * alpha + jnp.sum(p_mat, axis=-1, keepdims=True)
                acc = acc * alpha + jax.lax.dot_general(
                    p_mat.astype(vs[h].dtype), vs[h][k_off:k_off + sub_k, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_run = m_new
            if lse_ref is not None:
                lse = jnp.where(l_run == 0.0, -_NEG_INF, m_run + jnp.log(l_run))
                lse_ref[0, 0, h:h + 1, q_start:q_start + sub_q] = _col_to_row(lse)
            l_safe = jnp.where(l_run == 0.0, 1.0, l_run)
            outs.append((acc / l_safe).astype(o_ref.dtype))
        for p in range(num_pairs):
            o_ref[0, q_start:q_start + sub_q, p * lanes:(p + 1) * lanes] = (
                jnp.concatenate(outs[2 * p:2 * p + 2], axis=-1)
            )


def _packed_specs(
    batch: int, seq_len: int, num_heads: int, head_dim: int, h_block: int,
    block_q: int,
):
    """BlockSpecs mapping q/k/v lane regions of one [B, S, 3·H·D] buffer.

    The lane-dim block index is in units of h_block·D, so region offsets are
    multiples of ``groups = H // h_block``."""
    groups = num_heads // h_block
    lane_blk = h_block * head_dim
    q_spec = pl.BlockSpec((1, block_q, lane_blk), lambda b, h, i: (b, i, h))
    k_spec = pl.BlockSpec(
        (1, seq_len, lane_blk), lambda b, h, i: (b, 0, groups + h)
    )
    v_spec = pl.BlockSpec(
        (1, seq_len, lane_blk), lambda b, h, i: (b, 0, 2 * groups + h)
    )
    return q_spec, k_spec, v_spec, lane_blk


def banded_sub_blocks(
    seq_len: int, block_q: int, window: int | None
) -> tuple[int, int] | None:
    """Pick in-program (sub_q, sub_k) for the banded windowed kernel, or
    None to use grid-level skipping.

    The banded kernel pays off when a q sub-block's band covers a small
    fraction of the sequence: measured 2.0x at S=2048 (1.01 vs 2.08
    ms/local-layer at B=8, base) where coverage is ~19%, but 20% SLOWER
    at S=512 where coverage is 62% — [sub_q, D] MXU tiles re-load
    systolic-array weights ~2.5x more often, which only the skipped
    fraction can buy back. Gate: coverage ≤ 50%. The S cap reflects
    VMEM: one program holds q/k/v for the whole sequence (at S=8192
    that is ~25 MB/head — over the 32 MB scope).
    ``OPEN_PROVENCE_TPU_BANDED=0`` reverts to grid-level skipping."""
    if window is None:
        return None
    if os.environ.get("OPEN_PROVENCE_TPU_BANDED", "1") == "0":
        return None
    # (128, 256) won the r3 one-variant-per-process sweep at S=2048:
    # 347.0k tok/s model-level vs 303.9k at (128,128), 329.7k at (256,256),
    # 308.8k at (256,128) — wide k sub-tiles amortize MXU weight reloads
    # while a narrow sub_q keeps each walk's band coverage tight.
    sub_env = os.environ.get("OPEN_PROVENCE_TPU_BANDED_SUB", "128,256")
    sub_q, sub_k = (int(x) for x in sub_env.split(","))
    # Fully-static variant only: one q program spanning the sequence.
    if (
        block_q != seq_len
        or seq_len > 4096
        or seq_len % sub_q != 0
        or seq_len % sub_k != 0
        or seq_len == sub_q
    ):
        return None
    # Coverage guard: sub-blocking must skip at least half the tiles.
    if 2 * (sub_q + 2 * window + sub_k) > seq_len:
        return None
    return sub_q, sub_k


def _flash_forward_packed(
    qkv: jnp.ndarray,
    num_heads: int,
    padding_mask: jnp.ndarray | None,
    rope: jnp.ndarray | None,
    window: int | None,
    block_q: int,
    block_k: int,
    emit_lse: bool = False,
):
    batch, seq_len, three_hd = qkv.shape
    head_dim = three_hd // (3 * num_heads)
    hidden = num_heads * head_dim
    scale = head_dim**-0.5
    has_mask = padding_mask is not None
    mask_arr = (
        padding_mask.astype(jnp.int32).reshape(batch, 1, seq_len)
        if has_mask
        else jnp.ones((batch, 1, seq_len), dtype=jnp.int32)
    )
    has_rope = rope is not None
    rope_in = (
        rope.astype(qkv.dtype)
        if has_rope
        else jnp.zeros((2, seq_len, head_dim), dtype=qkv.dtype)
    )
    h_block = _choose_h_block(
        num_heads,
        seq_len,
        head_dim,
        block_q,
        jnp.dtype(qkv.dtype).itemsize,
        row_tile_rows=block_q if emit_lse else 0,
        even_only=True,
    )
    q_spec, k_spec, v_spec, lane_blk = _packed_specs(
        batch, seq_len, num_heads, head_dim, h_block, block_q
    )
    grid = (batch, num_heads // h_block, seq_len // block_q)
    band_min_off, band_stride = 0, 1
    band_inputs, band_specs = [], []
    sub = banded_sub_blocks(seq_len, block_q, window)
    if sub is not None:
        sub_q, sub_k = sub
        band, band_min_off, band_stride = _band_bias_table(
            seq_len, sub_q, sub_k, window
        )
        band_inputs = [band]
        band_specs = [
            pl.BlockSpec(band.shape, lambda b, h, i: (0, 0, 0))
        ]
        kernel = functools.partial(
            _flash_kernel_packed_banded,
            seq_len=seq_len,
            block_q=block_q,
            sub_q=sub_q,
            sub_k=sub_k,
            h_block=h_block,
            head_dim=head_dim,
            window=window,
            scale=scale,
            has_mask=has_mask,
            has_rope=has_rope,
            band_min_off=band_min_off,
            band_stride=band_stride,
        )
    else:
        if window is not None:
            band, band_min_off, band_stride = _band_bias_table(
                seq_len, block_q, block_k, window
            )
            band_inputs = [band]
            band_specs = [
                pl.BlockSpec(band.shape, lambda b, h, i: (0, 0, 0))
            ]
        kernel = functools.partial(
            _flash_kernel_packed,
            seq_len=seq_len,
            block_q=block_q,
            block_k=block_k,
            h_block=h_block,
            head_dim=head_dim,
            window=window,
            scale=scale,
            has_mask=has_mask,
            has_rope=has_rope,
            band_min_off=band_min_off,
            band_stride=band_stride,
        )
    out_spec = pl.BlockSpec((1, block_q, lane_blk), lambda b, h, i: (b, i, h))
    # lse layout [B, G, h_block, S] (G = num_heads // h_block, S on LANES):
    # the old [B, H, S, 1] trailing-1 layout lane-pads x128 under TPU tiling,
    # and XLA's fwd→bwd relayout copy of that padding measured ~6.8 ms/step
    # at b64 S512 (22 layers). With S minormost the padding is only
    # h_block -> 8 on sublanes, and each (b, h, i) grid step owns a distinct
    # block (Mosaic needs the block's last dim 128-divisible or equal to the
    # array dim — heads-on-lanes h_block slices are neither).
    lse_spec = pl.BlockSpec(
        (1, 1, h_block, block_q), lambda b, h, i: (b, h, 0, i)
    )
    return _pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            q_spec,
            k_spec,
            v_spec,
            pl.BlockSpec((1, 1, seq_len), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((2, seq_len, head_dim), lambda b, h, i: (0, 0, 0)),
            *band_specs,
        ],
        out_specs=([out_spec, lse_spec] if emit_lse else out_spec),
        out_shape=(
            [
                jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
                jax.ShapeDtypeStruct(
                    (batch, num_heads // h_block, h_block, seq_len),
                    jnp.float32,
                ),
            ]
            if emit_lse
            else jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # The rope-as-matmul rewrite grew the per-head fp32 stack past the
            # 16 MB default scoped-vmem limit at h_block=6; v5e has 128 MB of
            # VMEM, so a 32 MB scope is comfortably safe.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * seq_len * seq_len * head_dim,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=batch * num_heads * seq_len * seq_len,
        ),
    )(qkv, qkv, qkv, mask_arr, rope_in, *band_inputs)


def _band_bias(
    mask_ref, row_ids, k_off, block_q, block_k, window, has_mask
):
    """Additive 0/−inf bias shared by every head of a program — replaces
    per-head window/padding `where` chains (measured ~40% of kernel time when
    recomputed per head). Padding-only masks return a [1, bk] row bias
    (broadcast in ``s + bias``) instead of materializing [bq, bk]."""
    if window is None and not has_mask:
        return None
    if window is not None:
        col_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_off
        )
        valid = jnp.abs(row_ids - col_ids) <= window
        if has_mask:
            kmask = mask_ref[0, 0, pl.ds(k_off, block_k)]
            valid = valid & (kmask > 0)[None, :]
        return jnp.where(valid, 0.0, _NEG_INF)
    kmask = mask_ref[0, 0, pl.ds(k_off, block_k)]
    return jnp.where(kmask > 0, 0.0, _NEG_INF)[None, :]


def _bwd_dq_kernel_packed(
    q_ref,  # [1, bq, h·D] — q lane region
    k_ref,  # [1, S, h·D]
    v_ref,  # [1, S, h·D]
    do_ref,  # [1, bq, h·D]
    lse_ref,  # [1, h, bq, 1] fp32
    delta_ref,  # [1, h, bq, 1] fp32
    mask_ref,  # [1, 1, S]
    rope_ref,  # [2, S, D]
    dq_ref,  # [1, bq, h·D]
    *,
    seq_len: int,
    block_q: int,
    block_k: int,
    h_block: int,
    head_dim: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
):
    qi = pl.program_id(2)
    num_k_blocks = seq_len // block_k
    if window is None:
        k_lo, k_hi = 0, num_k_blocks
    else:
        q_start = qi * block_q
        q_end = q_start + block_q - 1
        k_lo = jnp.maximum(0, (q_start - window) // block_k)
        k_hi = jnp.minimum(num_k_blocks, (q_end + window) // block_k + 1)

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
    )
    lanes = 2 * head_dim
    if has_rope:
        rot_p = _rot_half_matrix(head_dim, q_ref.dtype)
        cos_q = rope_ref[0, pl.ds(qi * block_q, block_q), :]
        sin_q = rope_ref[1, pl.ds(qi * block_q, block_q), :]

    num_pairs = h_block // 2
    qs, dos, lses, deltas = [], [], [], []
    for p in range(num_pairs):
        q_pair = q_ref[0, :, p * lanes:(p + 1) * lanes]
        do_pair = do_ref[0, :, p * lanes:(p + 1) * lanes]
        for sub in range(2):
            h = 2 * p + sub
            q = q_pair[:, sub * head_dim:(sub + 1) * head_dim]
            if has_rope:
                q = _apply_rope_mx(q, cos_q, sin_q, rot_p)
            qs.append(q)
            dos.append(do_pair[:, sub * head_dim:(sub + 1) * head_dim])
            lses.append(lse_ref[0, h])  # [bq, 1] fp32
            deltas.append(delta_ref[0, h])

    def kj_body(kj, carry):
        k_off = kj * block_k
        bias = _band_bias(
            mask_ref, row_ids, k_off, block_q, block_k, window, has_mask
        )
        if has_rope:
            cos_k = rope_ref[0, pl.ds(k_off, block_k), :]
            sin_k = rope_ref[1, pl.ds(k_off, block_k), :]
        accs = []
        for p in range(num_pairs):
            k_pair = k_ref[0, pl.ds(k_off, block_k), p * lanes:(p + 1) * lanes]
            v_pair = v_ref[0, pl.ds(k_off, block_k), p * lanes:(p + 1) * lanes]
            for sub in range(2):
                h = 2 * p + sub
                k = k_pair[:, sub * head_dim:(sub + 1) * head_dim]
                v = v_pair[:, sub * head_dim:(sub + 1) * head_dim]
                if has_rope:
                    k = _apply_rope_mx(k, cos_k, sin_k, rot_p)
                s = jax.lax.dot_general(
                    qs[h], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if bias is not None:
                    s = s + bias
                p_mat = jnp.exp(s - lses[h])
                dp = jax.lax.dot_general(
                    dos[h], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = p_mat * (dp - deltas[h])
                accs.append(
                    carry[h] + jax.lax.dot_general(
                        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
        return tuple(accs)

    zeros = jnp.zeros((block_q, head_dim), dtype=jnp.float32)
    final = jax.lax.fori_loop(k_lo, k_hi, kj_body, (zeros,) * h_block)
    for p in range(num_pairs):
        halves = []
        for sub in range(2):
            dq_rot = final[2 * p + sub] * scale
            if has_rope:
                dq_rot = _rope_adjoint_mx(
                    dq_rot.astype(q_ref.dtype), cos_q, sin_q, rot_p
                )
            halves.append(dq_rot.astype(dq_ref.dtype))
        dq_ref[0, :, p * lanes:(p + 1) * lanes] = jnp.concatenate(halves, axis=-1)


def _bwd_dkv_kernel_packed(
    q_ref,  # [1, S, h·D]
    k_ref,  # [1, bk, h·D]
    v_ref,  # [1, bk, h·D]
    do_ref,  # [1, S, h·D]
    lse_ref,  # [1, h, S, 1] fp32
    delta_ref,  # [1, h, S, 1] fp32
    mask_ref,  # [1, 1, S]
    rope_ref,  # [2, S, D]
    dk_ref,  # [1, bk, h·D]
    dv_ref,  # [1, bk, h·D]
    *,
    seq_len: int,
    block_q: int,
    block_k: int,
    h_block: int,
    head_dim: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
):
    kj = pl.program_id(2)
    k_off = kj * block_k
    num_q_blocks = seq_len // block_q
    if window is None:
        q_lo, q_hi = 0, num_q_blocks
    else:
        q_lo = jnp.maximum(0, (k_off - window) // block_q)
        q_hi = jnp.minimum(
            num_q_blocks, (k_off + block_k - 1 + window) // block_q + 1
        )

    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_off
    )
    lanes = 2 * head_dim
    if has_rope:
        rot_p = _rot_half_matrix(head_dim, q_ref.dtype)
        cos_k = rope_ref[0, pl.ds(k_off, block_k), :]
        sin_k = rope_ref[1, pl.ds(k_off, block_k), :]
    if has_mask:
        kmask_block = mask_ref[0, 0, pl.ds(k_off, block_k)]

    num_pairs = h_block // 2
    ks, vs = [], []
    for p in range(num_pairs):
        k_pair = k_ref[0, :, p * lanes:(p + 1) * lanes]
        v_pair = v_ref[0, :, p * lanes:(p + 1) * lanes]
        for sub in range(2):
            k = k_pair[:, sub * head_dim:(sub + 1) * head_dim]
            if has_rope:
                k = _apply_rope_mx(k, cos_k, sin_k, rot_p)
            ks.append(k)
            vs.append(v_pair[:, sub * head_dim:(sub + 1) * head_dim])

    def qi_body(qi, carry):
        q_off = qi * block_q
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_off
        )
        # Reuse the shared-bias builder: row/col roles mirrored via row_ids.
        bias = None
        if window is not None:
            valid = jnp.abs(row_ids - col_ids) <= window
            if has_mask:
                valid = valid & (kmask_block > 0)[None, :]
            bias = jnp.where(valid, 0.0, _NEG_INF)
        elif has_mask:
            bias = jnp.where(kmask_block > 0, 0.0, _NEG_INF)[None, :]
        if has_rope:
            cos_q = rope_ref[0, pl.ds(q_off, block_q), :]
            sin_q = rope_ref[1, pl.ds(q_off, block_q), :]
        outs = []
        for p in range(num_pairs):
            q_pair = q_ref[0, pl.ds(q_off, block_q), p * lanes:(p + 1) * lanes]
            do_pair = do_ref[0, pl.ds(q_off, block_q), p * lanes:(p + 1) * lanes]
            for sub in range(2):
                h = 2 * p + sub
                dk_acc, dv_acc = carry[2 * h], carry[2 * h + 1]
                q = q_pair[:, sub * head_dim:(sub + 1) * head_dim]
                if has_rope:
                    q = _apply_rope_mx(q, cos_q, sin_q, rot_p)
                do = do_pair[:, sub * head_dim:(sub + 1) * head_dim]
                lse = lse_ref[0, h, pl.ds(q_off, block_q)]  # [bq, 1]
                delta = delta_ref[0, h, pl.ds(q_off, block_q)]
                s = jax.lax.dot_general(
                    q, ks[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                if bias is not None:
                    s = s + bias
                p_mat = jnp.exp(s - lse)
                dv_new = dv_acc + jax.lax.dot_general(
                    p_mat.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(
                    do, vs[h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = p_mat * (dp - delta)
                dk_new = dk_acc + jax.lax.dot_general(
                    ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.extend((dk_new, dv_new))
        return tuple(outs)

    zeros = jnp.zeros((block_k, head_dim), dtype=jnp.float32)
    final = jax.lax.fori_loop(q_lo, q_hi, qi_body, (zeros,) * (2 * h_block))
    for p in range(num_pairs):
        dk_halves, dv_halves = [], []
        for sub in range(2):
            h = 2 * p + sub
            dk_rot = final[2 * h] * scale
            if has_rope:
                dk_rot = _rope_adjoint_mx(
                    dk_rot.astype(k_ref.dtype), cos_k, sin_k, rot_p
                )
            dk_halves.append(dk_rot.astype(dk_ref.dtype))
            dv_halves.append(final[2 * h + 1].astype(dv_ref.dtype))
        dk_ref[0, :, p * lanes:(p + 1) * lanes] = jnp.concatenate(dk_halves, axis=-1)
        dv_ref[0, :, p * lanes:(p + 1) * lanes] = jnp.concatenate(dv_halves, axis=-1)


def _bwd_fused_kernel_packed(
    q_ref,  # [1, S, h·D] — q lane region
    k_ref,  # [1, S, h·D]
    v_ref,  # [1, S, h·D]
    do_ref,  # [1, S, h·D]
    lse_ref,  # [1, h, S, 1] fp32 (legacy rows — dispatch converts in XLA)
    delta_ref,  # [1, h, S, 1] fp32
    mask_ref,  # [1, 1, S]
    rope_ref,  # [2, S, D]
    out_ref,  # [1, S, h·D] — the dq/dk/dv lane region of ONE [B,S,3HD] buffer
    dk_scratch,  # VMEM [S, h·D]
    dv_scratch,  # VMEM [S, h·D]
    *,
    seq_len: int,
    sub_q: int,
    sub_k: int,
    h_block: int,
    head_dim: int,
    window: int | None,
    scale: float,
    has_mask: bool,
    has_rope: bool,
):
    """One-pass FA2 backward: dq, dk, dv from a single S/P/dP recompute.

    The split dq/dkv kernels each rebuild S = QKᵀ and dP = dO·Vᵀ, paying 7
    GEMM-units per tile across the two passes; recomputing them once and
    emitting all three grads costs 5 — a 2/7 FLOP cut in attention backward —
    and reads qkv/dO/lse/delta from HBM once instead of twice. The price is
    holding the whole sequence per (batch, head-group) program, so the
    dispatcher gates this kernel on seq_len (training shapes: S=512).

    Rope is applied ONCE per head to full-S q/k (the split kernels re-apply
    it per block iteration), at pair width (128 lanes) like the forward.
    Static sub-tiling (sub_q × sub_k) keeps fp32 temporaries bounded and
    statically skips tiles outside a local layer's |i−j| ≤ window band.

    The sequential 3-step `part` grid axis emits the cotangent PACKED:
    part 0 computes everything, writes dq to its output block (the q lane
    region of the single [B, S, 3·H·D] output) and parks dk/dv in VMEM
    scratch; parts 1 and 2 flush the scratches to the k/v lane regions.
    Replaces the XLA-level dq|dk|dv concatenate (0.39 ms/layer,
    pad_maximum_fusion) but measured SLOWER overall (254.0 vs 239.3
    ms/step at b64 — the sequential part axis stalls cross-step
    pipelining more than the concat costs), so the 3-output variant is
    the default and this one is gated behind
    OPEN_PROVENCE_TPU_BWD_FUSED_PACKED_OUT=1."""
    part = pl.program_id(2)

    @pl.when(part == 1)
    def _write_dk():
        out_ref[0] = dk_scratch[...]

    @pl.when(part == 2)
    def _write_dv():
        out_ref[0] = dv_scratch[...]

    @pl.when(part == 0)
    def _compute():
        _bwd_fused_compute(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
            rope_ref,
            lambda p, lanes, val: out_ref.__setitem__(
                (0, slice(None), slice(p * lanes, (p + 1) * lanes)), val
            ),
            lambda p, lanes, val: dk_scratch.__setitem__(
                (slice(None), slice(p * lanes, (p + 1) * lanes)), val
            ),
            lambda p, lanes, val: dv_scratch.__setitem__(
                (slice(None), slice(p * lanes, (p + 1) * lanes)), val
            ),
            seq_len=seq_len, sub_q=sub_q, sub_k=sub_k, h_block=h_block,
            head_dim=head_dim, window=window, scale=scale,
            has_mask=has_mask, has_rope=has_rope,
        )


def _bwd_fused_kernel_1out(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, rope_ref,
    out_ref, *,
    hidden, seq_len, sub_q, sub_k, h_block, head_dim, window, scale,
    has_mask, has_rope, fwd_h_block,
):
    """Single-output fused backward for the groups==1 case (every head in
    one VMEM-resident group): the whole [1, S, 3·H·D] cotangent is ONE
    contiguous output block, so dq/dk/dv land in their lane regions
    directly — no XLA concatenate (3-output variant) and no sequential
    3-step part axis (the packed-out variant's stall). Needs a sub tile
    axis ≤256 so all heads' fp32 temporaries fit VMEM; at base dims the
    dispatcher picks (512, 256), which timed even with (512, 512) in the
    3-output sweep. DEFAULT ON: 230.1 ms/step vs 239.0 for 3-out+concat
    at b64 S512 (278 vs 268 pairs/s); OPEN_PROVENCE_TPU_BWD_FUSED_ONEOUT=0
    reverts."""
    _bwd_fused_compute(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, rope_ref,
        lambda p, lanes, val: out_ref.__setitem__(
            (0, slice(None), slice(p * lanes, (p + 1) * lanes)), val
        ),
        lambda p, lanes, val: out_ref.__setitem__(
            (0, slice(None),
             slice(hidden + p * lanes, hidden + (p + 1) * lanes)),
            val,
        ),
        lambda p, lanes, val: out_ref.__setitem__(
            (0, slice(None),
             slice(2 * hidden + p * lanes, 2 * hidden + (p + 1) * lanes)),
            val,
        ),
        seq_len=seq_len, sub_q=sub_q, sub_k=sub_k, h_block=h_block,
        head_dim=head_dim, window=window, scale=scale,
        has_mask=has_mask, has_rope=has_rope, fwd_h_block=fwd_h_block,
    )


def _bwd_fused_kernel_3out(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, rope_ref,
    dq_ref, dk_ref, dv_ref, *,
    seq_len, sub_q, sub_k, h_block, head_dim, window, scale,
    has_mask, has_rope,
):
    """Default fused one-pass backward: three [B, S, H·D] outputs, packed
    back into d(qkv) by one XLA concatenate (see _bwd_fused_kernel_packed's
    docstring for why the packed-output variant lost)."""
    _bwd_fused_compute(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, rope_ref,
        lambda p, lanes, val: dq_ref.__setitem__(
            (0, slice(None), slice(p * lanes, (p + 1) * lanes)), val
        ),
        lambda p, lanes, val: dk_ref.__setitem__(
            (0, slice(None), slice(p * lanes, (p + 1) * lanes)), val
        ),
        lambda p, lanes, val: dv_ref.__setitem__(
            (0, slice(None), slice(p * lanes, (p + 1) * lanes)), val
        ),
        seq_len=seq_len, sub_q=sub_q, sub_k=sub_k, h_block=h_block,
        head_dim=head_dim, window=window, scale=scale,
        has_mask=has_mask, has_rope=has_rope,
    )


def _bwd_fused_compute(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, rope_ref,
    write_dq, write_dk, write_dv, *,
    seq_len, sub_q, sub_k, h_block, head_dim, window, scale,
    has_mask, has_rope, fwd_h_block=0,
):
    """``fwd_h_block > 0`` selects the grouped-rows residual layout the
    forward emits natively (lse block [1, G, fwd_h_block, S] with S on lanes
    and delta [1, S, H] with heads on lanes) — used by the one-out variant,
    whose single all-heads group makes every (g, j) index static. The
    grouped/3-out fallbacks pass 0 and read the legacy [1, h_block, S, 1]
    rows their dispatch converts to in XLA."""
    if os.environ.get("OPEN_PROVENCE_TPU_BWD_PIPELINE", "0") == "1":
        return _bwd_fused_compute_pipelined(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
            rope_ref, write_dq, write_dk, write_dv,
            seq_len=seq_len, sub_q=sub_q, sub_k=sub_k, h_block=h_block,
            head_dim=head_dim, window=window, scale=scale,
            has_mask=has_mask, has_rope=has_rope, fwd_h_block=fwd_h_block,
        )
    lanes = 2 * head_dim
    num_pairs = h_block // 2
    nq = seq_len // sub_q
    nk = seq_len // sub_k

    # Power-of-two softmax scale folds losslessly into q (exponent shift in
    # any float dtype — same trick as the forward kernels): replaces one
    # [sub_q, sub_k] fp32 VPU multiply per tile per head with one [S, 2D]
    # bf16 multiply per pair, and rides along into dk via ds^T @ q_scaled.
    scale_is_pow2 = float(scale) != 0.0 and (
        abs(scale) == 2.0 ** round(math.log2(abs(scale)))
    )

    if has_rope:
        rot_pp = _rot_half_matrix_pair(head_dim, q_ref.dtype)
        cos = rope_ref[0]  # [S, D]
        sin = rope_ref[1]
        cos2 = jnp.concatenate([cos, cos], axis=-1)  # [S, 2D] pair lanes
        sin2 = jnp.concatenate([sin, sin], axis=-1)

    def tile_needed(qi: int, kj: int) -> bool:
        if window is None:
            return True
        lo_r, hi_r = qi * sub_q, qi * sub_q + sub_q - 1
        lo_c, hi_c = kj * sub_k, kj * sub_k + sub_k - 1
        if lo_c > hi_r:
            dist = lo_c - hi_r
        elif lo_r > hi_c:
            dist = lo_r - hi_c
        else:
            dist = 0
        return dist <= window

    # One shared additive bias per (qi, kj) tile, hoisted out of the head
    # loops — per-head rebuilds were the measured ~40% bias-chain cost the
    # split kernels already avoid.
    biases: dict[tuple[int, int], jnp.ndarray | None] = {}
    for qi in range(nq):
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (sub_q, sub_k), 0)
            + qi * sub_q
        )
        for kj in range(nk):
            if not tile_needed(qi, kj):
                continue
            biases[(qi, kj)] = _band_bias(
                mask_ref, row_ids, kj * sub_k, sub_q, sub_k, window, has_mask
            )

    for p in range(num_pairs):
        q_pair = q_ref[0, :, p * lanes:(p + 1) * lanes]
        k_pair = k_ref[0, :, p * lanes:(p + 1) * lanes]
        v_pair = v_ref[0, :, p * lanes:(p + 1) * lanes]
        do_pair = do_ref[0, :, p * lanes:(p + 1) * lanes]
        if has_rope:
            q_pair = _apply_rope_mx(q_pair, cos2, sin2, rot_pp)
            k_pair = _apply_rope_mx(k_pair, cos2, sin2, rot_pp)
        if scale_is_pow2:
            q_pair = q_pair * jnp.asarray(scale, dtype=q_pair.dtype)

        dq_halves, dk_halves, dv_halves = [], [], []
        for sub in range(2):
            h = 2 * p + sub
            q = q_pair[:, sub * head_dim:(sub + 1) * head_dim]
            k = k_pair[:, sub * head_dim:(sub + 1) * head_dim]
            v = v_pair[:, sub * head_dim:(sub + 1) * head_dim]
            do = do_pair[:, sub * head_dim:(sub + 1) * head_dim]
            if fwd_h_block:
                g_idx, j_idx = h // fwd_h_block, h % fwd_h_block
                lse_h = _row_to_col(lse_ref[0, g_idx, j_idx:j_idx + 1, :])
                delta_h = delta_ref[0, :, h:h + 1]  # [S, 1] (lane h of [S, H])
            else:
                lse_h = lse_ref[0, h]  # [S, 1] fp32 (legacy [1, hb, S, 1])
                delta_h = delta_ref[0, h]

            dq_tiles = [
                jnp.zeros((sub_q, head_dim), jnp.float32) for _ in range(nq)
            ]
            dk_tiles = [
                jnp.zeros((sub_k, head_dim), jnp.float32) for _ in range(nk)
            ]
            dv_tiles = [
                jnp.zeros((sub_k, head_dim), jnp.float32) for _ in range(nk)
            ]
            for qi in range(nq):
                q_i = q[qi * sub_q:(qi + 1) * sub_q]
                do_i = do[qi * sub_q:(qi + 1) * sub_q]
                lse_i = lse_h[qi * sub_q:(qi + 1) * sub_q]
                delta_i = delta_h[qi * sub_q:(qi + 1) * sub_q]
                for kj in range(nk):
                    if (qi, kj) not in biases:
                        continue
                    bias = biases[(qi, kj)]
                    k_j = k[kj * sub_k:(kj + 1) * sub_k]
                    v_j = v[kj * sub_k:(kj + 1) * sub_k]
                    s = jax.lax.dot_general(
                        q_i, k_j, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if not scale_is_pow2:
                        s = s * scale
                    if bias is not None:
                        s = s + bias
                    p_mat = jnp.exp(s - lse_i)
                    dp = jax.lax.dot_general(
                        do_i, v_j, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ds = p_mat * (dp - delta_i)
                    dv_tiles[kj] = dv_tiles[kj] + jax.lax.dot_general(
                        p_mat.astype(do.dtype), do_i, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    ds_c = ds.astype(q.dtype)
                    dk_tiles[kj] = dk_tiles[kj] + jax.lax.dot_general(
                        ds_c, q_i, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dq_tiles[qi] = dq_tiles[qi] + jax.lax.dot_general(
                        ds_c, k_j, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

            dq_halves.append(
                (jnp.concatenate(dq_tiles, axis=0) * scale).astype(q_ref.dtype)
            )
            # With the pow2 fold, q already carried the scale into dk via
            # ds^T @ q_scaled; otherwise apply it here as before.
            dk_full = jnp.concatenate(dk_tiles, axis=0)
            if not scale_is_pow2:
                dk_full = dk_full * scale
            dk_halves.append(dk_full.astype(q_ref.dtype))
            dv_halves.append(
                jnp.concatenate(dv_tiles, axis=0).astype(q_ref.dtype)
            )

        dq_p = jnp.concatenate(dq_halves, axis=-1)
        dk_p = jnp.concatenate(dk_halves, axis=-1)
        if has_rope:
            dq_p = _rope_adjoint_mx(dq_p, cos2, sin2, rot_pp)
            dk_p = _rope_adjoint_mx(dk_p, cos2, sin2, rot_pp)
        write_dq(p, lanes, dq_p)
        write_dk(p, lanes, dk_p)
        write_dv(p, lanes, jnp.concatenate(dv_halves, axis=-1))


def _bwd_fused_compute_pipelined(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref, rope_ref,
    write_dq, write_dk, write_dv, *,
    seq_len, sub_q, sub_k, h_block, head_dim, window, scale,
    has_mask, has_rope, fwd_h_block=0,
):
    """2-stage software-pipelined variant of ``_bwd_fused_compute``
    (``OPEN_PROVENCE_TPU_BWD_PIPELINE=1``): same math, reordered issue.

    The serial body chains MXU and VPU phases per (head, q-tile, k-tile)
    tile — s = qkᵀ (MXU, half-rate at D=64) → exp (VPU) → dp = do·vᵀ (MXU)
    → ds (VPU) → dv/dk/dq dots (MXU) — so the MXU idles through every VPU
    phase. Here every tile's two recompute dots are issued one pipeline
    stage AHEAD of its VPU phase: in source order the stream is
    [s/dp of tile t+1] [exp/ds of tile t] [dv/dk/dq of tile t] …, giving
    an in-order scheduler back-to-back MXU work to overlap each VPU phase
    with. Accumulators and write points are identical to the serial body;
    results are bit-identical (same ops, same order per accumulator)."""
    lanes = 2 * head_dim
    num_pairs = h_block // 2
    nq = seq_len // sub_q
    nk = seq_len // sub_k

    scale_is_pow2 = float(scale) != 0.0 and (
        abs(scale) == 2.0 ** round(math.log2(abs(scale)))
    )

    if has_rope:
        rot_pp = _rot_half_matrix_pair(head_dim, q_ref.dtype)
        cos = rope_ref[0]
        sin = rope_ref[1]
        cos2 = jnp.concatenate([cos, cos], axis=-1)
        sin2 = jnp.concatenate([sin, sin], axis=-1)

    def tile_needed(qi: int, kj: int) -> bool:
        if window is None:
            return True
        lo_r, hi_r = qi * sub_q, qi * sub_q + sub_q - 1
        lo_c, hi_c = kj * sub_k, kj * sub_k + sub_k - 1
        if lo_c > hi_r:
            dist = lo_c - hi_r
        elif lo_r > hi_c:
            dist = lo_r - hi_c
        else:
            dist = 0
        return dist <= window

    biases: dict[tuple[int, int], jnp.ndarray | None] = {}
    for qi in range(nq):
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (sub_q, sub_k), 0)
            + qi * sub_q
        )
        for kj in range(nk):
            if not tile_needed(qi, kj):
                continue
            biases[(qi, kj)] = _band_bias(
                mask_ref, row_ids, kj * sub_k, sub_q, sub_k, window, has_mask
            )

    # Per-pair state (inputs + per-half accumulators), built at first issue.
    pair_state: dict[int, dict] = {}

    def get_pair(p: int) -> dict:
        st = pair_state.get(p)
        if st is None:
            q_pair = q_ref[0, :, p * lanes:(p + 1) * lanes]
            k_pair = k_ref[0, :, p * lanes:(p + 1) * lanes]
            v_pair = v_ref[0, :, p * lanes:(p + 1) * lanes]
            do_pair = do_ref[0, :, p * lanes:(p + 1) * lanes]
            if has_rope:
                q_pair = _apply_rope_mx(q_pair, cos2, sin2, rot_pp)
                k_pair = _apply_rope_mx(k_pair, cos2, sin2, rot_pp)
            if scale_is_pow2:
                q_pair = q_pair * jnp.asarray(scale, dtype=q_pair.dtype)
            st = {
                "q": q_pair, "k": k_pair, "v": v_pair, "do": do_pair,
                "dq": [[jnp.zeros((sub_q, head_dim), jnp.float32)
                        for _ in range(nq)] for _ in range(2)],
                "dk": [[jnp.zeros((sub_k, head_dim), jnp.float32)
                        for _ in range(nk)] for _ in range(2)],
                "dv": [[jnp.zeros((sub_k, head_dim), jnp.float32)
                        for _ in range(nk)] for _ in range(2)],
                "remaining": 2 * len(biases),
            }
            pair_state[p] = st
        return st

    def head_rows(p: int, sub: int):
        h = 2 * p + sub
        if fwd_h_block:
            g_idx, j_idx = h // fwd_h_block, h % fwd_h_block
            lse_h = _row_to_col(lse_ref[0, g_idx, j_idx:j_idx + 1, :])
            delta_h = delta_ref[0, :, h:h + 1]
        else:
            lse_h = lse_ref[0, h]
            delta_h = delta_ref[0, h]
        return lse_h, delta_h

    tiles = [
        (p, sub, qi, kj)
        for p in range(num_pairs)
        for sub in range(2)
        for qi in range(nq)
        for kj in range(nk)
        if (qi, kj) in biases
    ]

    def issue(tile):
        """Stage 1: the two independent recompute dots (MXU)."""
        p, sub, qi, kj = tile
        st = get_pair(p)
        q = st["q"][:, sub * head_dim:(sub + 1) * head_dim]
        k = st["k"][:, sub * head_dim:(sub + 1) * head_dim]
        v = st["v"][:, sub * head_dim:(sub + 1) * head_dim]
        do = st["do"][:, sub * head_dim:(sub + 1) * head_dim]
        q_i = q[qi * sub_q:(qi + 1) * sub_q]
        do_i = do[qi * sub_q:(qi + 1) * sub_q]
        k_j = k[kj * sub_k:(kj + 1) * sub_k]
        v_j = v[kj * sub_k:(kj + 1) * sub_k]
        s = jax.lax.dot_general(
            q_i, k_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_i, v_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (tile, s, dp, q_i, do_i, k_j)

    def retire(staged):
        """Stage 2: VPU epilogue + the three accumulation dots."""
        (p, sub, qi, kj), s, dp, q_i, do_i, k_j = staged
        st = pair_state[p]
        lse_h, delta_h = head_rows(p, sub)
        lse_i = lse_h[qi * sub_q:(qi + 1) * sub_q]
        delta_i = delta_h[qi * sub_q:(qi + 1) * sub_q]
        if not scale_is_pow2:
            s = s * scale
        bias = biases[(qi, kj)]
        if bias is not None:
            s = s + bias
        p_mat = jnp.exp(s - lse_i)
        ds = p_mat * (dp - delta_i)
        st["dv"][sub][kj] = st["dv"][sub][kj] + jax.lax.dot_general(
            p_mat.astype(do_ref.dtype), do_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds_c = ds.astype(q_ref.dtype)
        st["dk"][sub][kj] = st["dk"][sub][kj] + jax.lax.dot_general(
            ds_c, q_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        st["dq"][sub][qi] = st["dq"][sub][qi] + jax.lax.dot_general(
            ds_c, k_j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        st["remaining"] -= 1
        if st["remaining"] == 0:
            flush_pair(p)

    def flush_pair(p: int):
        st = pair_state[p]
        dq_halves, dk_halves, dv_halves = [], [], []
        for sub in range(2):
            dq_halves.append(
                (jnp.concatenate(st["dq"][sub], axis=0) * scale)
                .astype(q_ref.dtype)
            )
            dk_full = jnp.concatenate(st["dk"][sub], axis=0)
            if not scale_is_pow2:
                dk_full = dk_full * scale
            dk_halves.append(dk_full.astype(q_ref.dtype))
            dv_halves.append(
                jnp.concatenate(st["dv"][sub], axis=0).astype(q_ref.dtype)
            )
        dq_p = jnp.concatenate(dq_halves, axis=-1)
        dk_p = jnp.concatenate(dk_halves, axis=-1)
        if has_rope:
            dq_p = _rope_adjoint_mx(dq_p, cos2, sin2, rot_pp)
            dk_p = _rope_adjoint_mx(dk_p, cos2, sin2, rot_pp)
        write_dq(p, lanes, dq_p)
        write_dk(p, lanes, dk_p)
        write_dv(p, lanes, jnp.concatenate(dv_halves, axis=-1))

    pending = None
    for tile in tiles:
        staged = issue(tile)
        if pending is not None:
            retire(pending)
        pending = staged
    if pending is not None:
        retire(pending)


def _fused_bwd_sub_blocks(
    seq_len: int, window: int | None
) -> tuple[int, int] | None:
    """(sub_q, sub_k) for the fused one-pass backward, or None to use the
    split dq/dkv kernels.

    Gates: whole-sequence-per-program only pays while q/k/v/do + the three
    fp32 accumulators fit comfortably per head (S ≤ 1024 covers the training
    shapes; longer sequences stay on the split kernels whose block grids
    bound VMEM). ``OPEN_PROVENCE_TPU_BWD_FUSED=0`` reverts;
    ``OPEN_PROVENCE_TPU_BWD_FUSED_SUB="sq,sk"`` overrides the tile shape."""
    if os.environ.get("OPEN_PROVENCE_TPU_BWD_FUSED", "1") == "0":
        return None
    if seq_len > 1024:
        return None
    sub_env = os.environ.get("OPEN_PROVENCE_TPU_BWD_FUSED_SUB")
    if sub_env:
        sub_q, sub_k = (int(x) for x in sub_env.split(","))
    else:
        # Full-sequence tiles: at S=512 the window-128 band covers 62% of
        # the matrix, where sub-tile skipping measured slower than one big
        # MXU walk in the forward (banded_sub_blocks); backward defaults
        # match until a sweep says otherwise.
        sub_q = sub_k = min(seq_len, 512)
    if seq_len % sub_q != 0 or seq_len % sub_k != 0:
        return None
    return sub_q, sub_k


def _flash_backward_fused_packed(
    qkv, num_heads, mask_in, rope_in, lse, delta, g, window, sub_q, sub_k,
    has_mask, has_rope,
):
    """Dispatch the one-pass fused backward. Returns d(qkv) [B, S, 3·H·D]."""
    batch, seq_len, three_hd = qkv.shape
    head_dim = three_hd // (3 * num_heads)
    hidden = num_heads * head_dim
    scale = head_dim**-0.5
    # Per-head VMEM: 4 bf16 [S, D] inputs (double-buffered), 3 fp32 [S, D]
    # accumulators, and the [sub_q, sub_k] fp32 temporaries.
    itemsize = jnp.dtype(qkv.dtype).itemsize
    per_head = (
        4 * 2 * seq_len * head_dim * itemsize
        + 3 * seq_len * head_dim * 4
        + 4 * sub_q * sub_k * 4
        + 2 * 2 * seq_len * 128 * 4  # legacy lse/delta rows, lane-padded
    )
    budget = 24 * 1024 * 1024
    h_block = 2
    for cand in (8, 6, 4, 2):
        if num_heads % cand == 0 and cand * per_head <= budget:
            h_block = cand
            break
    groups = num_heads // h_block
    lane_blk = h_block * head_dim
    statics = dict(
        seq_len=seq_len,
        sub_q=sub_q,
        sub_k=sub_k,
        h_block=h_block,
        head_dim=head_dim,
        window=window,
        scale=scale,
        has_mask=has_mask,
        has_rope=has_rope,
    )
    if os.environ.get("OPEN_PROVENCE_TPU_BWD_FUSED_ONEOUT", "1") != "0":
        # Single-group single-output variant: all heads resident at once,
        # d(qkv) written as one contiguous [1, S, 3·H·D] block. Pick the
        # largest sub tiles whose fp32 temporaries fit with every head
        # resident (512×512 at 12 heads needs ~67 MB — too big; 512×256
        # ~47 MB fits, and the 3-output sweep showed sub_k=256 costs
        # nothing while sub_q<512 costs ~1.5%).
        def _fits(sq, sk):
            per_head_1 = (
                4 * 2 * seq_len * head_dim * itemsize
                + 3 * seq_len * head_dim * 4
                + 4 * sq * sk * 4
            )
            # Grouped-rows lse ([G, hb→8-pad, S]) and [S, H→128-pad] delta
            # are shared across heads — tiny next to the old per-head
            # lane-padded charge (kept per-head it barred (512,512) for no
            # reason at 12 heads; measured choice unchanged at base dims).
            shared_rows = 2 * num_heads * seq_len * 4 + seq_len * 128 * 4
            total = (
                num_heads * per_head_1
                + 4 * seq_len * 3 * hidden * itemsize
                + shared_rows
            )
            return total <= 56 * 1024 * 1024

        sub_q_1 = sub_k_1 = None
        for sq, sk in (
            (sub_q, sub_k),
            (sub_q, min(sub_k, 256)),
            (min(sub_q, 256), min(sub_k, 256)),
        ):
            if seq_len % sq == 0 and seq_len % sk == 0 and _fits(sq, sk):
                sub_q_1, sub_k_1 = sq, sk
                break
        if sub_q_1 is not None:
            fwd_groups, fwd_hb = lse.shape[1], lse.shape[2]
            statics_1 = dict(
                statics, sub_q=sub_q_1, sub_k=sub_k_1, h_block=num_heads,
            )
            full_spec = pl.BlockSpec(
                (1, seq_len, hidden), lambda b: (b, 0, 0)
            )
            return _pallas_call(
                functools.partial(
                    _bwd_fused_kernel_1out, hidden=hidden,
                    fwd_h_block=fwd_hb, **statics_1
                ),
                grid=(batch,),
                in_specs=[
                    full_spec,
                    pl.BlockSpec((1, seq_len, hidden), lambda b: (b, 0, 1)),
                    pl.BlockSpec((1, seq_len, hidden), lambda b: (b, 0, 2)),
                    full_spec,
                    # lse in the forward's native [B, G, hb, S] grouped-rows
                    # layout, delta in the reduce-natural [B, S, H] — no XLA
                    # relayout between the forward and backward kernels.
                    pl.BlockSpec(
                        (1, fwd_groups, fwd_hb, seq_len),
                        lambda b: (b, 0, 0, 0),
                    ),
                    pl.BlockSpec(
                        (1, seq_len, num_heads), lambda b: (b, 0, 0)
                    ),
                    pl.BlockSpec((1, 1, seq_len), lambda b: (b, 0, 0)),
                    pl.BlockSpec((2, seq_len, head_dim), lambda b: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, seq_len, 3 * hidden), lambda b: (b, 0, 0)
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (batch, seq_len, 3 * hidden), qkv.dtype
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
            )(qkv, qkv, qkv, g, lse, delta, mask_in, rope_in)

    # Grouped/3-out fallbacks iterate h_block-head groups whose lse/delta
    # slices can't form legal Mosaic blocks in the grouped-rows layout
    # (lane/sublane dims neither 128/8-divisible nor full) — convert to the
    # legacy [B, H, S, 1] rows in XLA. Costs the relayout these paths always
    # paid; only the default one-out path gets the copy-free residuals.
    lse = lse.reshape(batch, num_heads, seq_len)[..., None]
    delta = delta.transpose(0, 2, 1)[..., None]

    packed_out = (
        os.environ.get("OPEN_PROVENCE_TPU_BWD_FUSED_PACKED_OUT", "0") == "1"
    )
    if packed_out:
        # Grid part axis (last, sequential): part 0 computes everything and
        # writes dq; parts 1/2 flush the dk/dv VMEM scratches into the k/v
        # lane regions of the SAME [B, S, 3·H·D] output. Measured slower
        # than 3 outputs + XLA concat (see _bwd_fused_kernel_packed).
        q_spec = pl.BlockSpec(
            (1, seq_len, lane_blk), lambda b, h, p: (b, 0, h)
        )
        k_spec = pl.BlockSpec(
            (1, seq_len, lane_blk), lambda b, h, p: (b, 0, groups + h)
        )
        v_spec = pl.BlockSpec(
            (1, seq_len, lane_blk), lambda b, h, p: (b, 0, 2 * groups + h)
        )
        g_spec = pl.BlockSpec(
            (1, seq_len, lane_blk), lambda b, h, p: (b, 0, h)
        )
        row_spec = pl.BlockSpec(
            (1, h_block, seq_len, 1), lambda b, h, p: (b, h, 0, 0)
        )
        mask_spec = pl.BlockSpec((1, 1, seq_len), lambda b, h, p: (b, 0, 0))
        rope_spec = pl.BlockSpec(
            (2, seq_len, head_dim), lambda b, h, p: (0, 0, 0)
        )
        out_spec = pl.BlockSpec(
            (1, seq_len, lane_blk), lambda b, h, p: (b, 0, p * groups + h)
        )
        return _pallas_call(
            functools.partial(_bwd_fused_kernel_packed, **statics),
            grid=(batch, groups, 3),
            in_specs=[q_spec, k_spec, v_spec, g_spec, row_spec, row_spec,
                      mask_spec, rope_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (batch, seq_len, 3 * hidden), qkv.dtype
            ),
            scratch_shapes=[
                pltpu.VMEM((seq_len, lane_blk), qkv.dtype),
                pltpu.VMEM((seq_len, lane_blk), qkv.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(qkv, qkv, qkv, g, lse, delta, mask_in, rope_in)

    q_spec = pl.BlockSpec((1, seq_len, lane_blk), lambda b, h: (b, 0, h))
    k_spec = pl.BlockSpec(
        (1, seq_len, lane_blk), lambda b, h: (b, 0, groups + h)
    )
    v_spec = pl.BlockSpec(
        (1, seq_len, lane_blk), lambda b, h: (b, 0, 2 * groups + h)
    )
    g_spec = pl.BlockSpec((1, seq_len, lane_blk), lambda b, h: (b, 0, h))
    row_spec = pl.BlockSpec(
        (1, h_block, seq_len, 1), lambda b, h: (b, h, 0, 0)
    )
    mask_spec = pl.BlockSpec((1, 1, seq_len), lambda b, h: (b, 0, 0))
    rope_spec = pl.BlockSpec((2, seq_len, head_dim), lambda b, h: (0, 0, 0))
    out_spec = pl.BlockSpec((1, seq_len, lane_blk), lambda b, h: (b, 0, h))
    dq, dk, dv = _pallas_call(
        functools.partial(_bwd_fused_kernel_3out, **statics),
        grid=(batch, groups),
        in_specs=[q_spec, k_spec, v_spec, g_spec, row_spec, row_spec,
                  mask_spec, rope_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
            jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
            jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qkv, qkv, qkv, g, lse, delta, mask_in, rope_in)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _flash_backward_packed(
    qkv, num_heads, mask_arr, rope, out, lse, g, window, block_q, block_k
):
    batch, seq_len, three_hd = qkv.shape
    head_dim = three_hd // (3 * num_heads)
    hidden = num_heads * head_dim
    scale = head_dim**-0.5
    has_mask = mask_arr is not None
    mask_in = (
        mask_arr.astype(jnp.int32).reshape(batch, 1, seq_len)
        if has_mask
        else jnp.ones((batch, 1, seq_len), dtype=jnp.int32)
    )
    has_rope = rope is not None
    rope_in = (
        rope.astype(qkv.dtype)
        if has_rope
        else jnp.zeros((2, seq_len, head_dim), dtype=qkv.dtype)
    )
    # delta: per-head rowwise (dO·O) — [B, S, H], the reduce's natural output
    # order (heads on lanes), so no transpose materializes; the one-out fused
    # kernel reads it directly. lse arrives in the forward's grouped-rows
    # [B, G, hb, S] layout (S on lanes) for the same reason.
    #
    # Cast dO to the kernel dtype FIRST and derive delta from that: the
    # kernel's dp term reads the bf16 dO, so this is the self-consistent
    # delta — and it lets XLA drop the fp32 copy of dO the upstream
    # dO = g @ Wo^T dot was emitting alongside the bf16 one (dual-output
    # convert_multiply_fusion, ~100 MB/layer at b64 S512, profile r5b).
    # Whole-step A/B measured this neutral at b64 (the copies overlapped),
    # but the smaller live set matters at larger batches; loss identical.
    g = g.astype(qkv.dtype)
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(batch, seq_len, num_heads, head_dim)
        .sum(-1)
    )

    fused_sub = _fused_bwd_sub_blocks(seq_len, window)
    if fused_sub is not None:
        return _flash_backward_fused_packed(
            qkv, num_heads, mask_in, rope_in, lse, delta, g, window,
            fused_sub[0], fused_sub[1], has_mask, has_rope,
        )

    # Split kernels read legacy [B, H, S, 1] rows (see the grouped-rows
    # conversion note in _flash_backward_fused_packed).
    lse = lse.reshape(batch, num_heads, seq_len)[..., None]
    delta = delta.transpose(0, 2, 1)[..., None]

    # The statically-unrolled head loop (kj/qi-outer structure) keeps every
    # head's fp32 temporaries on the Mosaic stack at once — the default
    # 10 MB budget picked h_block=4 and overflowed the 16 MB scoped limit by
    # 0.4 MB at B=256, S=512, so the packed backward runs a tighter budget.
    h_block = _choose_h_block(
        num_heads,
        seq_len,
        head_dim,
        max(block_q, block_k),
        jnp.dtype(qkv.dtype).itemsize,
        row_tile_rows=2 * seq_len,
        even_only=True,
        vmem_budget=6 * 1024 * 1024,
    )
    statics = dict(
        seq_len=seq_len,
        block_q=block_q,
        block_k=block_k,
        h_block=h_block,
        head_dim=head_dim,
        window=window,
        scale=scale,
        has_mask=has_mask,
        has_rope=has_rope,
    )
    groups = num_heads // h_block
    lane_blk = h_block * head_dim
    q_blk = pl.BlockSpec((1, block_q, lane_blk), lambda b, h, i: (b, i, h))
    k_blk = pl.BlockSpec(
        (1, block_k, lane_blk), lambda b, h, i: (b, i, groups + h)
    )
    v_blk = pl.BlockSpec(
        (1, block_k, lane_blk), lambda b, h, i: (b, i, 2 * groups + h)
    )
    q_full = pl.BlockSpec((1, seq_len, lane_blk), lambda b, h, i: (b, 0, h))
    k_full = pl.BlockSpec(
        (1, seq_len, lane_blk), lambda b, h, i: (b, 0, groups + h)
    )
    v_full = pl.BlockSpec(
        (1, seq_len, lane_blk), lambda b, h, i: (b, 0, 2 * groups + h)
    )
    g_blk = pl.BlockSpec((1, block_q, lane_blk), lambda b, h, i: (b, i, h))
    g_full = pl.BlockSpec((1, seq_len, lane_blk), lambda b, h, i: (b, 0, h))
    out_kv_blk = pl.BlockSpec((1, block_k, lane_blk), lambda b, h, i: (b, i, h))
    qrow = pl.BlockSpec((1, h_block, block_q, 1), lambda b, h, i: (b, h, i, 0))
    full_row = pl.BlockSpec((1, h_block, seq_len, 1), lambda b, h, i: (b, h, 0, 0))
    mask_spec = pl.BlockSpec((1, 1, seq_len), lambda b, h, i: (b, 0, 0))
    rope_spec = pl.BlockSpec((2, seq_len, head_dim), lambda b, h, i: (0, 0, 0))

    dq = _pallas_call(
        functools.partial(_bwd_dq_kernel_packed, **statics),
        grid=(batch, groups, seq_len // block_q),
        in_specs=[q_blk, k_full, v_full, g_blk, qrow, qrow, mask_spec, rope_spec],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # The rope-as-matmul rewrite grew the per-head fp32 stack past the
            # 16 MB default scoped-vmem limit at h_block=6; v5e has 128 MB of
            # VMEM, so a 32 MB scope is comfortably safe.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(qkv, qkv, qkv, g, lse, delta, mask_in, rope_in)

    dk, dv = _pallas_call(
        functools.partial(_bwd_dkv_kernel_packed, **statics),
        grid=(batch, groups, seq_len // block_k),
        in_specs=[q_full, k_blk, v_blk, g_full, full_row, full_row, mask_spec,
                  rope_spec],
        out_specs=[out_kv_blk, out_kv_blk],
        out_shape=[
            jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
            jax.ShapeDtypeStruct((batch, seq_len, hidden), qkv.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # The rope-as-matmul rewrite grew the per-head fp32 stack past the
            # 16 MB default scoped-vmem limit at h_block=6; v5e has 128 MB of
            # VMEM, so a 32 MB scope is comfortably safe.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(qkv, qkv, qkv, g, lse, delta, mask_in, rope_in)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _xla_reference_packed(qkv, num_heads, mask_arr, rope, window):
    """Unpacked XLA attention on a packed [B, S, 3·H·D] buffer (tests +
    backward fallback)."""
    batch, seq_len, three_hd = qkv.shape
    head_dim = three_hd // (3 * num_heads)
    qkv5 = qkv.reshape(batch, seq_len, 3, num_heads, head_dim)
    q, k, v = (jnp.moveaxis(qkv5[:, :, i], 2, 1) for i in range(3))
    out = _xla_reference(q, k, v, mask_arr, rope, window)
    return jnp.moveaxis(out, 1, 2).reshape(batch, seq_len, num_heads * head_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_packed_core(
    qkv, mask_arr, rope, window, block_q, block_k, num_heads
):
    return _flash_forward_packed(
        qkv, num_heads, mask_arr, rope, window, block_q, block_k
    )


def _flash_packed_fwd(qkv, mask_arr, rope, window, block_q, block_k, num_heads):
    out, lse = _flash_forward_packed(
        qkv, num_heads, mask_arr, rope, window, block_q, block_k, emit_lse=True
    )
    return out, (qkv, mask_arr, rope, out, lse)


def _flash_packed_bwd(window, block_q, block_k, num_heads, residuals, g):
    qkv, mask_arr, rope, out, lse = residuals
    if os.environ.get("OPEN_PROVENCE_TPU_FLASH_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(
            lambda qkv_: _xla_reference_packed(qkv_, num_heads, mask_arr, rope, window),
            qkv,
        )
        (dqkv,) = vjp(g)
    else:
        seq_len = qkv.shape[1]
        if window is not None and block_q == seq_len:
            # The forward's banded promotion (block_q == S) has no backward
            # counterpart — the dq/dkv kernels band-skip at the grid level,
            # so give them their own grid-friendly blocks.
            block_q, block_k = pick_block_sizes(seq_len, window)
        bwd_env = os.environ.get("OPEN_PROVENCE_TPU_BWD_BLOCKS")
        if bwd_env:
            # Independent backward tile tuning ("bq,bk"): the dq/dkv kernels'
            # best shapes need not match the forward's.
            bq, bk = (int(x) for x in bwd_env.split(","))
            if seq_len % bq == 0 and seq_len % bk == 0:
                block_q, block_k = bq, bk
        dqkv = _flash_backward_packed(
            qkv, num_heads, mask_arr, rope, out, lse, g, window, block_q, block_k
        )
    d_rope = None if rope is None else jnp.zeros_like(rope)
    return dqkv, None, d_rope


_flash_attention_packed_core.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_packed(
    qkv: jnp.ndarray,
    *,
    num_heads: int,
    padding_mask: jnp.ndarray | None,
    window: int | None,
    rope: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
) -> jnp.ndarray:
    """Flash attention straight on the fused Wqkv output [B, S, 3·H·D]
    (HF lane order (qkv, head, dim)); returns [B, S, H·D] ready for Wo.

    Skips the q/k/v unbind and both [B,S,H,D]↔[B,H,S,D] transposes of the
    unpacked path. Requires 2·head_dim % 128 == 0 and even num_heads
    (heads are processed in pairs: Mosaic only lowers 128-aligned dynamic
    lane offsets)."""
    batch, seq_len, three_hd = qkv.shape
    if three_hd % (3 * num_heads) != 0:
        raise ValueError(f"qkv last dim {three_hd} not divisible by 3·{num_heads}")
    head_dim = three_hd // (3 * num_heads)
    if block_q is None and block_k is None:
        block_q, block_k = pick_block_sizes(seq_len, window)
        # Windowed layers: prefer one q program spanning the sequence when
        # the fully-static banded kernel applies (2x at S=2048 — see
        # banded_sub_blocks).
        if window is not None and banded_sub_blocks(
            seq_len, seq_len, window
        ) is not None:
            block_q = seq_len
    block_q = int(block_q or DEFAULT_BLOCK_Q)
    block_k = int(block_k or DEFAULT_BLOCK_K)
    if seq_len % block_q != 0 or seq_len % block_k != 0:
        raise ValueError(
            f"flash_attention_packed requires S divisible by block sizes; got "
            f"S={seq_len}, block_q={block_q}, block_k={block_k}"
        )
    if not pallas_packed_supported(batch, seq_len, num_heads, head_dim,
                                   min(block_q, 128)):
        raise ValueError(
            f"packed kernel unsupported for B={batch} S={seq_len} "
            f"H={num_heads} D={head_dim}"
        )
    mask_arr = None if padding_mask is None else padding_mask.astype(jnp.int32)
    rope_arr = None
    if rope is not None:
        cos, sin = rope
        rope_arr = jnp.stack([cos.astype(qkv.dtype), sin.astype(qkv.dtype)], axis=0)
    return _flash_attention_packed_core(
        qkv, mask_arr, rope_arr, window, block_q, block_k, num_heads
    )
