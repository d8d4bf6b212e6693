"""Dissect the base-512 forward: GEMM floor vs attention vs LN vs full model.

Times each piece as its own jitted function in ONE process (tunnel variance),
alternating rounds. All at B=32, S=512, ModernBERT-base shapes, bf16.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=10):
    import jax

    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    start = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.device_get([jax.tree.leaves(o)[0].ravel()[:1] for o in outs])
    return (time.perf_counter() - start) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from open_provence_tpu.models.model import build_module

    B, S, H, I, L, NH, HD = 32, 512, 768, 1152, 22, 12, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, H), dtype=jnp.bfloat16)

    # --- 1. full model ---
    config = _flagship_config()
    module = build_module(config)
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if jnp.issubdtype(v.dtype, jnp.floating) else v,
        params,
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 50000, (B, S)).astype(np.int32))
    mask = jnp.ones((B, S), dtype=jnp.int32)

    @jax.jit
    def full_auto(p, i, m):
        out = module.apply({"params": p}, i, m, deterministic=True, attention_impl="auto")
        return out["ranking_logits"]

    @jax.jit
    def full_xla(p, i, m):
        out = module.apply({"params": p}, i, m, deterministic=True, attention_impl="xla")
        return out["ranking_logits"]

    # --- 2. GEMM-only proxy: the 4 per-layer matmuls, scanned over layers ---
    k1, k2, k3, k4 = jax.random.split(key, 4)
    Wqkv = jax.random.normal(k1, (L, H, 3 * H), dtype=jnp.bfloat16) * 0.02
    Wo = jax.random.normal(k2, (L, H, H), dtype=jnp.bfloat16) * 0.02
    Wi = jax.random.normal(k3, (L, H, 2 * I), dtype=jnp.bfloat16) * 0.02
    Wo2 = jax.random.normal(k4, (L, I, H), dtype=jnp.bfloat16) * 0.02

    @jax.jit
    def gemm_stack(x, Wqkv, Wo, Wi, Wo2):
        def layer(h, ws):
            wqkv, wo, wi, wo2 = ws
            qkv = h @ wqkv
            a = qkv[..., :H] @ wo
            g = h @ wi
            inp, gate = jnp.split(g, 2, axis=-1)
            hidden = jax.nn.gelu(inp, approximate=False) * gate
            return h + a + hidden @ wo2, None

        h, _ = jax.lax.scan(layer, x, (Wqkv, Wo, Wi, Wo2))
        return h

    # --- 3. attention-only: the packed kernel at model shapes ---
    from open_provence_tpu.ops.flash_attention import flash_attention_packed
    from open_provence_tpu.ops.rotary import rope_tables

    qkv_in = jax.random.normal(key, (B, S, 3 * H), dtype=jnp.bfloat16)
    cos_l, sin_l = rope_tables(S, HD, 10000.0, dtype=jnp.float32)
    cos_g, sin_g = rope_tables(S, HD, 160000.0, dtype=jnp.float32)

    @jax.jit
    def attn_stack(qkv):
        out = qkv[..., :H] * 0.0
        # 8 global + 14 local layers (every 3rd is global, layer 0 global)
        for lid in range(L):
            if lid % 3 == 0:
                o = flash_attention_packed(qkv, num_heads=NH, padding_mask=None, window=None, rope=(cos_g, sin_g))
            else:
                o = flash_attention_packed(qkv, num_heads=NH, padding_mask=None, window=128, rope=(cos_l, sin_l))
            out = out + o
        return out

    # --- 4. LN-only: 45 fused LNs ---
    from open_provence_tpu.ops.layer_norm import fused_layer_norm

    scale = jnp.ones((H,), dtype=jnp.bfloat16)

    @jax.jit
    def ln_stack(x):
        h = x
        for _ in range(45):
            h = fused_layer_norm(h, scale, 1e-5)
        return h

    # --- run, alternating ---
    pieces = {
        "full_auto": (full_auto, (params, ids, mask)),
        "full_xla": (full_xla, (params, ids, mask)),
        "gemm_stack": (gemm_stack, (x, Wqkv, Wo, Wi, Wo2)),
        "attn_stack": (attn_stack, (qkv_in,)),
        "ln_stack_45": (ln_stack, (x,)),
    }
    results: dict[str, list[float]] = {}
    for rnd in range(3):
        for name, (fn, args) in pieces.items():
            ms = timeit(fn, args, iters=8) * 1e3
            results.setdefault(name, []).append(ms)
            print(json.dumps({"round": rnd, "piece": name, "ms": round(ms, 2)}), flush=True)
    print("--- medians (ms per B=32 batch) ---")
    for name, vals in results.items():
        print(json.dumps({"piece": name, "median_ms": round(float(np.median(vals)), 2)}), flush=True)


if __name__ == "__main__":
    main()
