"""Honest packed-kernel microbench: CSE defeated via distinct inputs.

Sweeps (block_q, block_k, h_block) for global and local(128) layers at
B=32, S=512, ModernBERT-base head geometry. One JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import open_provence_tpu.ops.flash_attention as fa
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, NH, HD = 32, 512, 768, 12, 64
    LAYERS = 8
    key = jax.random.PRNGKey(0)
    # Distinct qkv per layer — no CSE.
    qkvs = jax.random.normal(key, (LAYERS, B, S, 3 * H), dtype=jnp.bfloat16)
    cos, sin = rope_tables(S, HD, 10000.0, dtype=jnp.float32)
    mask = jnp.ones((B, S), dtype=jnp.int32)

    def make_stack(window, block_q, block_k, h_block, use_rope=True, use_mask=True):
        def stack(qkvs, mask):
            outs = []
            for lid in range(LAYERS):
                o = fa._flash_forward_packed(
                    qkvs[lid],
                    NH,
                    mask if use_mask else None,
                    jnp.stack([cos, sin]) if use_rope else None,
                    window,
                    block_q,
                    block_k,
                )
                outs.append(o[:1, :1, :1])  # tiny slice keeps all kernels live
            return jnp.concatenate(outs)

        return jax.jit(stack)

    def timeit(fn, args, iters=8):
        out = fn(*args)
        jax.device_get(out)
        start = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.device_get(outs)
        return (time.perf_counter() - start) / iters

    configs = []
    for window in (None, 128):
        for bq, bk in ((512, 512), (256, 512), (256, 256), (128, 256), (128, 128), (512, 256)):
            configs.append((window, bq, bk))

    # monkey-patch h_block choice via env-free direct param: _flash_forward_packed
    # computes h_block internally; to sweep it we temporarily patch _choose_h_block.
    orig_choose = fa._choose_h_block
    results = {}
    for h_force in (2, 4, 6):
        fa._choose_h_block = lambda *a, **k: h_force
        for window, bq, bk in configs:
            name = f"w={window} bq={bq} bk={bk} h={h_force}"
            try:
                fn = make_stack(window, bq, bk, h_force)
                ms = min(timeit(fn, (qkvs, mask)) * 1e3 for _ in range(2))
            except Exception as e:
                print(json.dumps({"cfg": name, "error": str(e)[:120]}), flush=True)
                continue
            per_layer = ms / LAYERS
            results[name] = per_layer
            print(json.dumps({"cfg": name, "ms_per_layer": round(per_layer, 4)}), flush=True)
    fa._choose_h_block = orig_choose
    print("--- best ---")
    for name, v in sorted(results.items(), key=lambda kv: kv[1])[:10]:
        print(json.dumps({"cfg": name, "ms_per_layer": round(v, 4)}), flush=True)


if __name__ == "__main__":
    main()
