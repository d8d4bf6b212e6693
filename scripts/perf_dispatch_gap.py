"""Quantify per-dispatch overhead and batch-size scaling of the forward.

(a) N separate dispatches of the B32/S512 forward vs one jit that lax.scans
the same N forwards on device — the difference is pure dispatch overhead.
(b) pairs/s at B in {32, 64, 128}: if dispatch overhead is fixed per call,
bigger batches amortize it.
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

    from __graft_entry__ import _flagship_config
    from open_provence_tpu.models.model import build_module

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

    def fwd_fn(p, i, m):
        out = module.apply({"params": p}, i, m, deterministic=True, attention_impl="auto")
        return jnp.sum(out["ranking_logits"], dtype=jnp.float32)

    rng = np.random.default_rng(0)

    # --- (b) batch scaling ---
    for batch in (32, 64, 128):
        ids = jnp.asarray(rng.integers(0, 50000, (batch, 512)).astype(np.int32))
        mask = jnp.ones((batch, 512), dtype=jnp.int32)
        fwd = jax.jit(fwd_fn)
        jax.device_get(fwd(params, ids, mask))
        jax.device_get(fwd(params, ids, mask))
        iters = 12
        start = time.perf_counter()
        outs = [fwd(params, ids, mask) for _ in range(iters)]
        jax.device_get(outs)
        ms = (time.perf_counter() - start) / iters * 1e3
        print(json.dumps({"case": f"B{batch}", "ms_per_call": round(ms, 2),
                          "pairs_per_sec": round(batch / (ms / 1e3), 1)}), flush=True)

    # --- (a) dispatch overhead: scan N forwards in one call ---
    N = 10
    ids = jnp.asarray(rng.integers(0, 50000, (N, 32, 512)).astype(np.int32))
    mask = jnp.ones((32, 512), dtype=jnp.int32)

    @jax.jit
    def scanned(p, ids_all, m):
        def body(acc, ids_i):
            return acc + fwd_fn(p, ids_i, m), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ids_all)
        return acc

    jax.device_get(scanned(params, ids, mask))
    jax.device_get(scanned(params, ids, mask))
    reps = 4
    start = time.perf_counter()
    outs = [scanned(params, ids, mask) for _ in range(reps)]
    jax.device_get(outs)
    ms = (time.perf_counter() - start) / reps / N * 1e3
    print(json.dumps({"case": f"scan{N}xB32", "ms_per_forward": round(ms, 2),
                      "pairs_per_sec": round(32 / (ms / 1e3), 1)}), flush=True)


if __name__ == "__main__":
    main()
