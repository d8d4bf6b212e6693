"""Sweep packed-flash block sizes per layer type (local/global) at B32/S512.

Local layers (window ±64) currently run bq=512 — one q block, so band
skipping never engages and they cost MORE than global layers (profiled
0.656 vs 0.516 ms). Smaller q/k blocks let the kernel skip out-of-band
k blocks (matmuls AND the fp32 exps).
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

    from open_provence_tpu.ops import flash_attention as fa
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, NH, HD = 32, 512, 12, 64
    LAYERS = 8
    qkvs = [
        jax.random.normal(jax.random.PRNGKey(i), (B, S, 3 * NH * HD), dtype=jnp.bfloat16)
        for i in range(LAYERS)
    ]
    cos, sin = rope_tables(S, HD, 10000.0, dtype=jnp.float32)
    rope = jnp.stack([cos.astype(jnp.bfloat16), sin.astype(jnp.bfloat16)])
    mask = jnp.ones((B, S), dtype=jnp.int32)

    def make(window, bq, bk):
        @jax.jit
        def stack(qkvs, mask):
            acc = jnp.zeros((), jnp.float32)
            for lid in range(LAYERS):
                o = fa._flash_forward_packed(
                    qkvs[lid], NH, mask, rope, window, bq, bk
                )
                acc = acc + jnp.sum(o, dtype=jnp.float32)
            return acc
        return stack

    def timed(fn, iters=10):
        jax.device_get(fn(qkvs, mask))
        start = time.perf_counter()
        outs = [fn(qkvs, mask) for _ in range(iters)]
        jax.device_get(outs)
        return (time.perf_counter() - start) / iters / LAYERS * 1e3

    cases = []
    for window in (64, None):
        for bq, bk in ((512, 256), (512, 512), (256, 256), (256, 128),
                       (128, 128), (128, 64), (256, 64)):
            if window is None and bk < 128:
                continue
            cases.append((window, bq, bk))

    fns = {}
    for window, bq, bk in cases:
        try:
            fn = make(window, bq, bk)
            jax.device_get(fn(qkvs, mask))
            fns[(window, bq, bk)] = fn
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"cfg": [window, bq, bk], "error": str(exc)[:120]}), flush=True)

    res = {}
    for rnd in range(3):
        for key, fn in fns.items():
            ms = timed(fn)
            res.setdefault(key, []).append(ms)
    for (window, bq, bk), vals in sorted(res.items(), key=lambda kv: np.median(kv[1])):
        print(
            json.dumps(
                {"window": window, "bq": bq, "bk": bk,
                 "median_ms_per_layer": round(float(np.median(vals)), 4)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
