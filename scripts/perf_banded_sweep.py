"""Kernel-level A/B of the static banded windowed kernel vs grid-level.

Times an 8-layer packed-attention stack (window=64, B=32, S=512) for
several (sub_q, sub_k) choices, plus the banded-off baseline — each
variant traced fresh in the same process but timed consecutively.
"""

from __future__ import annotations

import json
import os
import sys
import time

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

    def make(banded, sub=None):
        os.environ["OPEN_PROVENCE_TPU_BANDED"] = "1" if banded else "0"
        if sub:
            os.environ["OPEN_PROVENCE_TPU_BANDED_SUB"] = f"{sub[0]},{sub[1]}"

        @jax.jit
        def stack(qkvs, mask):
            acc = jnp.zeros((), jnp.float32)
            for lid in range(LAYERS):
                o = fa._flash_forward_packed(qkvs[lid], NH, mask, rope, 64, 512, 256)
                acc = acc + jnp.sum(o, dtype=jnp.float32)
            return acc
        return stack

    def timed(fn, iters=12):
        jax.device_get(fn(qkvs, mask))
        jax.device_get(fn(qkvs, mask))
        start = time.perf_counter()
        outs = [fn(qkvs, mask) for _ in range(iters)]
        jax.device_get(outs)
        return (time.perf_counter() - start) / iters / LAYERS * 1e3

    cases = {"off": make(False)}
    for sub in ((128, 128), (128, 256), (256, 128), (64, 128)):
        try:
            fn = make(True, sub)
            jax.device_get(fn(qkvs, mask))
            cases[f"banded{sub[0]}x{sub[1]}"] = fn
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"cfg": list(sub), "error": str(exc)[:100]}), flush=True)

    # Time each variant consecutively (executable switching once per variant,
    # warmed twice inside timed()).
    for name, fn in cases.items():
        ms = timed(fn)
        print(json.dumps({"cfg": name, "ms_per_layer": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
