"""From-scratch JAX/Flax ModernBERT encoder.

The reference project does NOT implement its backbone — it delegates to
``transformers.AutoModelForSequenceClassification`` (reference
open_provence/encoder.py:128-144); the published OpenProvence checkpoints are
ModernBERT-family models (reference utils/model_architecture.py:21-37). This
module implements that architecture natively for TPU:

* token embeddings + LayerNorm (no positional embeddings — rotary only),
* pre-norm transformer layers with an Identity attn-norm on layer 0,
* alternating attention: every ``global_attn_every_n_layers``-th layer is
  global, others use a ±(local_attention//2) sliding window,
* rotary embeddings with separate theta for local (10k) vs global (160k)
  layers, cos/sin in fp32,
* GeGLU MLP (Wi → split → act(x)·gate → Wo), bias-free linear/norm layout,
* fp32 softmax (parity with eager HF attention used by the checkpoints).

Parameter names mirror the HF module tree (``layers_<i>.attn.Wqkv`` etc.) so
HF safetensors checkpoints convert mechanically (utils/hf_convert.py).

Numeric parity with ``transformers.ModernBertModel`` (eager, fp32) is
enforced by tests/test_modernbert_parity.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import ModernBertBackboneConfig
from ..ops.attention import multi_head_attention, use_packed_flash
from ..ops.flash_attention import flash_attention_packed
from ..ops.layer_norm import (
    fused_add_layer_norm,
    fused_layer_norm,
    layer_norm_reference,
    pallas_layer_norm_supported,
)
from ..ops.rotary import rope_tables


class BackboneLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same param tree: scale [+bias]) that
    routes to the fused Pallas kernel on TPU.

    XLA lowers LayerNorm to convert→reduce chains costing ~4x the bandwidth
    bound (11.5 ms of a 71 ms base-512 forward); the fused kernel does one
    read/write pass with fp32 stats (ops/layer_norm.py). The fallback path
    reproduces flax semantics exactly (stats upcast to ≥fp32), so CPU tests
    and f64 parity runs are unaffected. ``OPEN_PROVENCE_TPU_FUSED_LN=0``
    forces the fallback."""

    epsilon: float = 1e-5
    use_bias: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        residual: jnp.ndarray | None = None,
        defer: bool = False,
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        """Without ``residual``: LayerNorm(x). With it: fuses the preceding
        residual add — returns ``(residual + x, LN(residual + x))`` in one
        HBM pass (XLA keeps the add as a standalone ~0.2 ms fusion once LN
        lives in Pallas).

        ``defer=True`` creates the scale param but does NOT normalize:
        returns ``(x, scale)`` (or ``(residual + x, scale)``), so the
        caller can fold the norm into the adjacent GEMM kernel
        (ops/geglu.py fused_ln_geglu / fused_ln_matmul) while the
        checkpoint tree keeps this module's ``<name>/scale`` entry."""
        import os

        from ..ops.attention import pallas_platform_ok

        hidden = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (hidden,))
        bias = (
            self.param("bias", nn.initializers.zeros, (hidden,))
            if self.use_bias
            else None
        )
        if defer:
            if bias is not None:
                raise ValueError(
                    "deferred LN requires a bias-free norm; the caller must "
                    "not fold a norm_bias=True LayerNorm into a GEMM kernel"
                )
            h = x if residual is None else residual + x
            return h, scale
        use_fused = (
            bias is None
            and pallas_platform_ok()
            and pallas_layer_norm_supported(x.shape)
            and x.dtype in (jnp.bfloat16, jnp.float32)
            and os.environ.get("OPEN_PROVENCE_TPU_FUSED_LN", "1") != "0"
        )
        if residual is not None:
            # Fusing the residual add into the LN kernel measured ~1.5%
            # SLOWER in-model (666 vs 676 pairs/s at B=32, S=512): the
            # two-output kernel displaces XLA's own scheduling around the
            # adds. Kept as an opt-in for re-evaluation on newer Mosaic.
            if use_fused and os.environ.get("OPEN_PROVENCE_TPU_ADD_LN") == "1":
                return fused_add_layer_norm(residual, x, scale, self.epsilon)
            h = residual + x
            if use_fused:
                return h, fused_layer_norm(h, scale, self.epsilon)
            return h, layer_norm_reference(h, scale, bias, self.epsilon)
        if use_fused:
            return fused_layer_norm(x, scale, self.epsilon)
        return layer_norm_reference(x, scale, bias, self.epsilon)


_ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError as exc:
        raise ValueError(f"Unsupported activation: {name!r}") from exc


class _DenseKernel(nn.Module):
    """Bare kernel parameter with nn.Dense's tree layout (``<name>/kernel``)
    and init — lets the fused-GeGLU path read the weight directly while
    keeping checkpoints interchangeable with the nn.Dense path."""

    shape: tuple[int, int]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.linear.default_kernel_init, self.shape
        )


def mlp_geglu_fusable(cfg: ModernBertBackboneConfig, rows: int, dtype) -> bool:
    """True when the MLP runs as the fused GeGLU Pallas kernel."""
    import os

    from ..ops.attention import pallas_platform_ok
    from ..ops.geglu import geglu_supported

    return (
        not cfg.mlp_bias
        and pallas_platform_ok()
        and dtype in (jnp.bfloat16, jnp.float32)
        and geglu_supported(
            rows, cfg.hidden_size, cfg.intermediate_size,
            jnp.dtype(dtype).itemsize, cfg.hidden_activation,
        )
        and os.environ.get("OPEN_PROVENCE_TPU_FUSED_GEGLU", "1") != "0"
    )


def mlp_tail_fusable(cfg: ModernBertBackboneConfig, rows: int, dtype) -> bool:
    """True when the WHOLE MLP (LN → GeGLU → Wo) runs as one Pallas kernel.

    Requires the deferred-norm path (ln_scale forwarded into the MLP) and no
    dropout between act·gate and Wo; the fused tail keeps the [rows, I]
    intermediate out of HBM entirely (forward AND backward)."""
    import os

    from ..ops.attention import pallas_platform_ok
    from ..ops.geglu import geglu_wo_supported

    return (
        not cfg.mlp_bias
        and cfg.mlp_dropout == 0.0
        and pallas_platform_ok()
        and dtype in (jnp.bfloat16, jnp.float32)
        and geglu_wo_supported(
            rows, cfg.hidden_size, cfg.intermediate_size,
            jnp.dtype(dtype).itemsize, cfg.hidden_activation,
        )
        and os.environ.get("OPEN_PROVENCE_TPU_FUSED_MLP_TAIL", "0") != "0"
    )


def attn_ln_fusable(cfg: ModernBertBackboneConfig, rows: int, dtype) -> bool:
    """True when attn_norm can fold into a fused LN+Wqkv Pallas matmul."""
    import os

    from ..ops.attention import pallas_platform_ok
    from ..ops.geglu import ln_matmul_supported

    return (
        not cfg.attention_bias
        and not cfg.norm_bias
        and pallas_platform_ok()
        and dtype in (jnp.bfloat16, jnp.float32)
        and ln_matmul_supported(
            rows, cfg.hidden_size, 3 * cfg.hidden_size,
            jnp.dtype(dtype).itemsize,
        )
        and os.environ.get("OPEN_PROVENCE_TPU_FUSED_LN_GEMM", "1") != "0"
    )


class ModernBertMLP(nn.Module):
    """GeGLU MLP: Wi projects to 2×intermediate; act(input)·gate → Wo.

    On TPU the Wi projection + gate run as one Pallas kernel
    (ops/geglu.py): XLA's materialize-[·,2I]-then-input-fuse plan held the
    Wo2 matmul at ~3x off peak and cost ~150 MB/layer of HBM traffic at
    base-512 shapes. ``OPEN_PROVENCE_TPU_FUSED_GEGLU=0`` reverts."""

    config: ModernBertBackboneConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        deterministic: bool = True,
        ln_scale: jnp.ndarray | None = None,
        ln_eps: float = 1e-5,
    ) -> jnp.ndarray:
        """``ln_scale`` (from a deferred mlp_norm) folds the pre-MLP
        LayerNorm into the GeGLU kernel's row tiles — one fewer HBM pass
        over the hidden state per layer."""
        from ..ops.geglu import fused_geglu, fused_ln_geglu, fused_ln_geglu_wo
        from ..ops.layer_norm import layer_norm_reference

        cfg = self.config
        rows = x.shape[0] * x.shape[1] if x.ndim == 3 else x.shape[0]
        use_fused = mlp_geglu_fusable(cfg, rows, x.dtype)
        if use_fused:
            wi_kernel = _DenseKernel(
                (cfg.hidden_size, 2 * cfg.intermediate_size), name="Wi"
            )().astype(x.dtype)
            x2d = x.reshape(rows, cfg.hidden_size)
            if ln_scale is not None and mlp_tail_fusable(cfg, rows, x.dtype):
                # Whole MLP in one kernel: the [rows, I] act·gate output
                # never touches HBM. Param tree matches the split path
                # (same "Wo"/"kernel" leaf as nn.Dense).
                wo_kernel = _DenseKernel(
                    (cfg.intermediate_size, cfg.hidden_size), name="Wo"
                )().astype(x.dtype)
                out2d = fused_ln_geglu_wo(
                    x2d, ln_scale, wi_kernel, wo_kernel,
                    cfg.hidden_activation, ln_eps,
                )
                return out2d.reshape(*x.shape[:-1], cfg.hidden_size)
            if ln_scale is not None:
                hidden = fused_ln_geglu(
                    x2d, ln_scale, wi_kernel, cfg.hidden_activation, ln_eps
                )
            else:
                hidden = fused_geglu(x2d, wi_kernel, cfg.hidden_activation)
            hidden = hidden.reshape(*x.shape[:-1], cfg.intermediate_size)
        else:
            if ln_scale is not None:
                x = layer_norm_reference(x, ln_scale, None, ln_eps)
            act = get_activation(cfg.hidden_activation)
            wi = nn.Dense(
                2 * cfg.intermediate_size, use_bias=cfg.mlp_bias, name="Wi"
            )(x)
            inp, gate = jnp.split(wi, 2, axis=-1)
            hidden = act(inp) * gate
        if cfg.mlp_dropout > 0.0:
            hidden = nn.Dropout(cfg.mlp_dropout)(hidden, deterministic=deterministic)
        return nn.Dense(cfg.hidden_size, use_bias=cfg.mlp_bias, name="Wo")(hidden)


class ModernBertAttention(nn.Module):
    """Fused-QKV multi-head attention with per-layer rotary + windowing."""

    config: ModernBertBackboneConfig
    layer_id: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: jnp.ndarray | None,
        *,
        deterministic: bool = True,
        attention_impl: str = "auto",
        ln_scale: jnp.ndarray | None = None,
        ln_eps: float = 1e-5,
    ) -> jnp.ndarray:
        from ..ops.geglu import fused_ln_matmul
        from ..ops.layer_norm import layer_norm_reference

        cfg = self.config
        batch, seq_len, _ = x.shape
        num_heads = cfg.num_attention_heads
        head_dim = cfg.head_dim

        if ln_scale is not None and attn_ln_fusable(
            cfg, batch * seq_len, x.dtype
        ):
            # attn_norm folded into the Wqkv projection's row tiles.
            wqkv_kernel = _DenseKernel(
                (cfg.hidden_size, 3 * cfg.hidden_size), name="Wqkv"
            )().astype(x.dtype)
            qkv = fused_ln_matmul(
                x.reshape(batch * seq_len, cfg.hidden_size),
                ln_scale, wqkv_kernel, ln_eps,
            ).reshape(batch, seq_len, 3 * cfg.hidden_size)
        else:
            if ln_scale is not None:
                x = layer_norm_reference(x, ln_scale, None, ln_eps)
            qkv = nn.Dense(
                3 * cfg.hidden_size, use_bias=cfg.attention_bias, name="Wqkv"
            )(x)

        theta = cfg.layer_rope_theta(self.layer_id)
        cos, sin = rope_tables(seq_len, head_dim, theta, dtype=jnp.float32)
        window_ = cfg.layer_window(self.layer_id)
        if use_packed_flash(attention_impl, batch, seq_len, num_heads, head_dim):
            # TPU fast path: the fused Wqkv output feeds the kernel directly
            # in HF lane order (qkv, head, dim) — no q/k/v unbind and no
            # [B,S,H,D]↔[B,H,S,D] transposes (~16% of forward time at
            # B=32, S=512 on v5e).
            out = flash_attention_packed(
                qkv,
                num_heads=num_heads,
                padding_mask=padding_mask,
                window=window_,
                rope=(cos, sin),
            )
            out = nn.Dense(
                cfg.hidden_size, use_bias=cfg.attention_bias, name="Wo"
            )(out)
            if cfg.attention_dropout > 0.0:
                out = nn.Dropout(cfg.attention_dropout)(
                    out, deterministic=deterministic
                )
            return out

        qkv = qkv.reshape(batch, seq_len, 3, num_heads, head_dim)
        # → [B, H, S, D] each (HF eager layout)
        q, k, v = (
            jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3)
        )

        # Rotary is delegated to the attention op: the pallas path fuses it
        # into the kernel (saves the rotate-half fusion + two rotated-array
        # materializations per layer); the xla path applies it there.
        out = multi_head_attention(
            q,
            k,
            v,
            padding_mask=padding_mask,
            window=window_,
            rope=(cos, sin),
            impl=attention_impl,
        )
        out = jnp.moveaxis(out, 1, 2).reshape(batch, seq_len, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, use_bias=cfg.attention_bias, name="Wo")(out)
        if cfg.attention_dropout > 0.0:
            out = nn.Dropout(cfg.attention_dropout)(out, deterministic=deterministic)
        return out


class ModernBertEncoderLayer(nn.Module):
    config: ModernBertBackboneConfig
    layer_id: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: jnp.ndarray | None,
        deterministic: bool = True,
        attention_impl: str = "auto",
    ) -> jnp.ndarray:
        # deterministic/attention_impl are positional so nn.remat can mark
        # them static (jax.checkpoint rejects non-array kwargs).
        cfg = self.config
        rows = x.shape[0] * x.shape[1]
        # Fold each pre-norm into its adjacent Pallas GEMM when possible:
        # the norm output feeds ONLY that projection, so normalizing inside
        # the GEMM's row tiles removes one HBM read+write of the hidden
        # state per norm (profiled 0.077 ms attn_norm / 0.032 ms mlp_norm
        # per layer at B=32, S=512, base).
        fuse_attn_ln = self.layer_id != 0 and attn_ln_fusable(cfg, rows, x.dtype)
        # A norm_bias=True checkpoint cannot defer mlp_norm into the GeGLU
        # kernel (the kernel is bias-free); fall back to the separate-norm
        # path, which still uses the fused GeGLU GEMM.
        fuse_mlp_ln = not cfg.norm_bias and mlp_geglu_fusable(cfg, rows, x.dtype)
        if self.layer_id == 0:
            # Layer 0 skips attn_norm: embeddings are already normalized.
            attn_in, attn_scale = x, None
        elif fuse_attn_ln:
            attn_in, attn_scale = BackboneLayerNorm(
                epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="attn_norm"
            )(x, defer=True)
        else:
            attn_in, attn_scale = BackboneLayerNorm(
                epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="attn_norm"
            )(x), None
        attn_out = ModernBertAttention(cfg, self.layer_id, name="attn")(
            attn_in,
            padding_mask,
            deterministic=deterministic,
            attention_impl=attention_impl,
            ln_scale=attn_scale,
            ln_eps=cfg.norm_eps,
        )
        if fuse_mlp_ln:
            x, mlp_scale = BackboneLayerNorm(
                epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="mlp_norm"
            )(attn_out, residual=x, defer=True)
            mlp_out = ModernBertMLP(cfg, name="mlp")(
                x, deterministic=deterministic,
                ln_scale=mlp_scale, ln_eps=cfg.norm_eps,
            )
        else:
            # The attention residual add is fused into mlp_norm's kernel.
            x, mlp_in = BackboneLayerNorm(
                epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="mlp_norm"
            )(attn_out, residual=x)
            mlp_out = ModernBertMLP(cfg, name="mlp")(
                mlp_in, deterministic=deterministic
            )
        x = x + mlp_out
        return x


class ModernBertEmbeddings(nn.Module):
    config: ModernBertBackboneConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, name="tok_embeddings"
        )(input_ids)
        embeddings = BackboneLayerNorm(
            epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="norm"
        )(embeddings)
        if cfg.embedding_dropout > 0.0:
            embeddings = nn.Dropout(cfg.embedding_dropout)(
                embeddings, deterministic=deterministic
            )
        return embeddings


class ModernBertEncoder(nn.Module):
    """Backbone returning both pre- and post-final-norm last hidden states.

    The reference's pruning head consumes ``outputs.hidden_states[-1]`` —
    which in HF is the last layer output *before* ``final_norm``
    (reference encoder.py:229-232 + HF ModernBertModel semantics) — while the
    ranking classifier pools the post-final-norm ``last_hidden_state``. Both
    are returned so checkpoint numerics match exactly.
    """

    config: ModernBertBackboneConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        padding_mask: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
        attention_impl: str = "auto",
        remat: bool = False,
    ) -> dict[str, jnp.ndarray]:
        cfg = self.config
        x = ModernBertEmbeddings(cfg, name="embeddings")(
            input_ids, deterministic=deterministic
        )
        layer_cls = ModernBertEncoderLayer
        if remat:
            # static_argnums index includes self at 0: (3, 4) = the
            # deterministic / attention_impl flags. prevent_cse must stay True
            # (the default): without the optimization barrier XLA CSEs the
            # backward recompute into the forward pass, pinning every layer's
            # attention residuals (incl. the 128-lane-padded LSE) in HBM at
            # once — observed as a 55 GB OOM at batch 256.
            layer_cls = nn.remat(ModernBertEncoderLayer, static_argnums=(3, 4))
        for layer_id in range(cfg.num_hidden_layers):
            x = layer_cls(cfg, layer_id, name=f"layers_{layer_id}")(
                x, padding_mask, deterministic, attention_impl
            )
        pre_final = x
        final = BackboneLayerNorm(
            epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="final_norm"
        )(x)
        return {"last_hidden_pre_norm": pre_final, "last_hidden_state": final}


class ModernBertPredictionHead(nn.Module):
    """dense → act → norm (HF ModernBertPredictionHead)."""

    config: ModernBertBackboneConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, use_bias=cfg.classifier_bias, name="dense")(x)
        x = get_activation(cfg.classifier_activation)(x)
        return BackboneLayerNorm(
            epsilon=cfg.norm_eps, use_bias=cfg.norm_bias, name="norm"
        )(x)


class ModernBertForSequenceClassification(nn.Module):
    """Backbone + pooled classification head (ranking logits).

    Matches HF ``ModernBertForSequenceClassification`` forward: pool (cls or
    masked mean) → prediction head → dropout → classifier.
    """

    config: ModernBertBackboneConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        padding_mask: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
        attention_impl: str = "auto",
        remat: bool = False,
    ) -> dict[str, Any]:
        cfg = self.config
        outputs = ModernBertEncoder(cfg, name="model")(
            input_ids,
            padding_mask,
            deterministic=deterministic,
            attention_impl=attention_impl,
            remat=remat,
        )
        hidden = outputs["last_hidden_state"]
        if cfg.classifier_pooling == "cls":
            pooled = hidden[:, 0]
        elif cfg.classifier_pooling == "mean":
            if padding_mask is None:
                pooled = jnp.mean(hidden, axis=1)
            else:
                mask = padding_mask[..., None].astype(hidden.dtype)
                pooled = (hidden * mask).sum(axis=1) / mask.sum(axis=1)
        else:
            raise ValueError(f"Unknown classifier_pooling: {cfg.classifier_pooling!r}")
        pooled = ModernBertPredictionHead(cfg, name="head")(pooled)
        if cfg.classifier_dropout > 0.0:
            pooled = nn.Dropout(cfg.classifier_dropout)(
                pooled, deterministic=deterministic
            )
        logits = nn.Dense(cfg.num_labels, name="classifier")(pooled)
        return {
            "logits": logits,
            "last_hidden_pre_norm": outputs["last_hidden_pre_norm"],
            "last_hidden_state": outputs["last_hidden_state"],
        }
