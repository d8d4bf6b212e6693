"""Micro-A/B of the GeGLU op in isolation at ModernBERT-base layer shapes.

Compares: (a) fused Pallas kernel, (b) XLA unfused composition alone,
(c) XLA composition + the Wo2 matmul (the real per-layer unit: measures
whether XLA's gelu-into-Wo2 input fusion is the true cost), and
(d) fused kernel + Wo2 matmul.
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

    from open_provence_tpu.ops.geglu import _geglu_reference, fused_geglu

    M, K, I = 32 * 512, 768, 1152
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.05, jnp.bfloat16)
    wi = jnp.asarray(rng.normal(size=(K, 2 * I)) * 0.05, jnp.bfloat16)
    wo = jnp.asarray(rng.normal(size=(I, K)) * 0.05, jnp.bfloat16)

    LAYERS = 8  # enough work to swamp dispatch overhead

    def rep(body):
        def fn(x, wi, wo):
            h = x
            for _ in range(LAYERS):
                h = body(h, wi, wo)
            # Reduce on device: fetching [M,K] bf16 (24 MB) per iter over
            # the tunnel would dominate the timed window.
            return jnp.sum(h, dtype=jnp.float32)
        return jax.jit(fn)

    variants = {
        "fused": rep(lambda h, wi, wo: fused_geglu(h, wi, "gelu") @ wo),
        "xla": rep(lambda h, wi, wo: _geglu_reference(h, wi, "gelu") @ wo),
    }
    for fn in variants.values():
        jax.device_get(fn(x, wi, wo))

    def timed(fn, iters=15):
        jax.device_get(fn(x, wi, wo))
        start = time.perf_counter()
        outs = [fn(x, wi, wo) for _ in range(iters)]
        jax.device_get(outs)
        return (time.perf_counter() - start) / iters / LAYERS * 1e3

    res: dict[str, list[float]] = {}
    for rnd in range(4):
        for name, fn in variants.items():
            ms = timed(fn)
            res.setdefault(name, []).append(ms)
            print(json.dumps({"round": rnd, "cfg": name, "ms_per_layer": round(ms, 4)}), flush=True)
    for name, vals in res.items():
        print(json.dumps({"cfg": name, "median_ms_per_layer": round(float(np.median(vals)), 4)}), flush=True)


if __name__ == "__main__":
    main()
