"""A/B: packed flash attention with vs without padding_mask at model shapes."""

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

    from open_provence_tpu.ops.flash_attention import flash_attention_packed
    from open_provence_tpu.ops.rotary import rope_tables

    B, S, H, NH, HD = 32, 512, 768, 12, 64
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, S, 3 * H), dtype=jnp.bfloat16)
    cos_l, sin_l = rope_tables(S, HD, 10000.0, dtype=jnp.float32)
    cos_g, sin_g = rope_tables(S, HD, 160000.0, dtype=jnp.float32)
    mask = jnp.ones((B, S), dtype=jnp.int32)

    def stack(qkv, mask_or_none):
        out = qkv[..., :H] * 0.0
        for lid in range(22):
            if lid % 3 == 0:
                o = flash_attention_packed(qkv, num_heads=NH, padding_mask=mask_or_none, window=None, rope=(cos_g, sin_g))
            else:
                o = flash_attention_packed(qkv, num_heads=NH, padding_mask=mask_or_none, window=128, rope=(cos_l, sin_l))
            out = out + o
        return out

    nomask = jax.jit(lambda q: stack(q, None))
    withmask = jax.jit(lambda q, m: stack(q, m))

    res = {}
    for rnd in range(3):
        for name, fn, args in [
            ("nomask", nomask, (qkv,)),
            ("mask", withmask, (qkv, mask)),
        ]:
            ms = timeit(fn, args, iters=8) * 1e3
            res.setdefault(name, []).append(ms)
            print(json.dumps({"round": rnd, "cfg": name, "ms": round(ms, 2)}), flush=True)
    for name, vals in res.items():
        print(json.dumps({"cfg": name, "median_ms": round(float(np.median(vals)), 2)}), flush=True)


if __name__ == "__main__":
    main()
