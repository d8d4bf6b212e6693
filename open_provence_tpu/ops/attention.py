"""Attention ops for the TPU backbone.

Two interchangeable implementations behind one functional interface:

* ``xla``    — einsum attention with additive masking and fp32 softmax. XLA
               fuses this well for short sequences; also the numerics
               reference for tests (matches HF eager attention, which the
               published checkpoints were evaluated with).
* ``pallas`` — fused flash-attention kernel with banded block skipping for
               ModernBERT's sliding-window layers (ops/flash_attention.py).
               This is the TPU counterpart of the reference's optional
               flash-attn path (standalone:1594-1607).

``impl="auto"`` picks pallas on TPU when shapes are tile-aligned, else xla.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


@functools.lru_cache(maxsize=8)
def _default_platform() -> str:
    return jax.devices()[0].platform


def pallas_interpret() -> bool:
    """True when OPEN_PROVENCE_TPU_PALLAS_INTERPRET=1: run every Pallas
    kernel through the interpreter, so CPU tests — including GSPMD-sharded
    ones on the virtual mesh — exercise the real kernel code paths."""
    return os.environ.get("OPEN_PROVENCE_TPU_PALLAS_INTERPRET", "0") == "1"


def pallas_platform_ok() -> bool:
    """Pallas kernels are usable: real TPU, or interpreter mode."""
    return _default_platform() == "tpu" or pallas_interpret()


def pallas_call(*args, **kwargs):
    """``pl.pallas_call`` with ``interpret`` defaulted from
    OPEN_PROVENCE_TPU_PALLAS_INTERPRET — the single entry point every kernel
    in ops/ uses, so interpreter-mode tests cover the real kernels."""
    from jax.experimental import pallas as pl

    kwargs.setdefault("interpret", pallas_interpret())
    return pl.pallas_call(*args, **kwargs)


def attention_bias(
    padding_mask: jnp.ndarray | None,
    seq_len: int,
    window: int | None,
    dtype=jnp.float32,
) -> jnp.ndarray | None:
    """Build an additive attention bias.

    padding_mask: [B, S] with 1 for valid tokens, or None.
    window: half-window size for sliding-window layers, or None for global.
    Returns [B, 1, S, S] (or [1, 1, S, S] when only a window is given), or
    None when no masking is needed.
    """
    bias = None
    if padding_mask is not None:
        key_mask = padding_mask[:, None, None, :].astype(jnp.bool_)  # [B,1,1,S]
        bias = jnp.where(key_mask, 0.0, _NEG_INF).astype(dtype)
    if window is not None:
        positions = jnp.arange(seq_len)
        distance = jnp.abs(positions[:, None] - positions[None, :])
        window_ok = (distance <= window)[None, None, :, :]  # [1,1,S,S]
        window_bias = jnp.where(window_ok, 0.0, _NEG_INF).astype(dtype)
        bias = window_bias if bias is None else bias + window_bias
    return bias


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """Reference attention. q/k/v: [B, H, S, D] → [B, H, S, D].

    Softmax is computed in float32 regardless of input dtype (the reference
    upcasts attention weights to fp32; thresholded pruning decisions depend
    on this).
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    acc_dtype = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_dtype
    ) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# Measured on v5e (ModernBERT-base, bf16) with adaptive block sizes: the
# flash kernel beats XLA's attention at every length overall (328 vs 287
# pairs/s at S=512; 97x at S=8192 where XLA materializes O(S²) fp32
# scores). In isolation XLA's fused global attention is slightly faster at
# short S, but in-model all-pallas measured faster (98 vs 105 ms/batch), so
# GLOBAL_XLA_MAX_SEQ defaults to 0 (env-overridable escape hatch).
PALLAS_MIN_SEQ = int(os.environ.get("OPEN_PROVENCE_TPU_PALLAS_MIN_SEQ", "128"))
GLOBAL_XLA_MAX_SEQ = int(os.environ.get("OPEN_PROVENCE_TPU_GLOBAL_XLA_MAX_SEQ", "0"))


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    padding_mask: jnp.ndarray | None,
    window: int | None,
    rope: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch attention over implementations. q/k/v: [B, H, S, D].

    With ``rope=(cos, sin)``, q/k arrive unrotated: the pallas path fuses
    rotary into the kernel; the xla path applies it here."""
    seq_len = q.shape[2]
    if impl == "auto":
        use_pallas = False
        if pallas_platform_ok() and seq_len >= PALLAS_MIN_SEQ:
            from .flash_attention import pallas_shapes_supported

            use_pallas = pallas_shapes_supported(q.shape)
            if window is None and seq_len <= GLOBAL_XLA_MAX_SEQ:
                use_pallas = False
        impl = "pallas" if use_pallas else "xla"

    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(
            q, k, v, padding_mask=padding_mask, window=window, rope=rope
        )
    if impl == "xla":
        if rope is not None:
            from .rotary import apply_rotary

            q, k = apply_rotary(q, k, rope[0], rope[1])
        bias = attention_bias(padding_mask, seq_len, window, dtype=jnp.float32)
        return xla_attention(q, k, v, bias)
    raise ValueError(f"Unknown attention impl: {impl!r}")


def use_packed_flash(
    impl: str, batch: int, seq_len: int, num_heads: int, head_dim: int
) -> bool:
    """Whether the model should feed the fused Wqkv output straight into
    ``flash_attention_packed`` (skipping the q/k/v unbind + transposes).

    Mirrors the ``impl="auto"`` pallas gating in :func:`multi_head_attention`
    plus the packed kernel's structural constraints.

    Measured on v5e (ModernBERT-base, B=32, S=512, alternating in-process
    A/B): packed 70.4 ms vs unpacked 86.5 ms (+23%) — the saved q/k/v
    unbind + [B,S,H,D]↔[B,H,S,D] transposes outweigh the in-kernel 64-lane
    head extraction. ``OPEN_PROVENCE_TPU_PACKED=0`` forces the unpacked
    path (A/B escape hatch)."""
    if impl == "xla":
        return False
    if os.environ.get("OPEN_PROVENCE_TPU_PACKED", "1") == "0":
        return False
    from .flash_attention import pallas_packed_supported

    if not pallas_packed_supported(batch, seq_len, num_heads, head_dim):
        return False
    if impl == "pallas":
        return True
    return pallas_platform_ok() and seq_len >= PALLAS_MIN_SEQ
