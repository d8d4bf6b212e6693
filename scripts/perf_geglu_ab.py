"""A/B on the real chip: fused GeGLU Pallas kernel vs XLA default MLP.

Alternates both configs in one process (single runs are 2x-variance over the
axon tunnel — see memory/axon-tpu-quirks.md). The env var is read at trace
time, so each variant is traced under its own setting.
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
    batch, seq = 32, 512
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50000, (batch, seq)).astype(np.int32))
    mask = jnp.ones((batch, seq), dtype=jnp.int32)

    def make(fused: bool):
        os.environ["OPEN_PROVENCE_TPU_FUSED_GEGLU"] = "1" if fused else "0"

        @jax.jit
        def fwd(p, i, m):
            out = module.apply({"params": p}, i, m, deterministic=True, attention_impl="auto")
            return out["ranking_logits"]

        # Trace+compile now, under the current env setting.
        jax.device_get(fwd(p=params, i=ids, m=mask))
        return fwd

    variants = {"fused": make(True), "xla": make(False)}

    def timed(fn, iters=15):
        jax.device_get(fn(params, ids, mask))
        start = time.perf_counter()
        outs = [fn(params, ids, mask) for _ in range(iters)]
        jax.device_get(outs)
        return (time.perf_counter() - start) / iters * 1e3

    res: dict[str, list[float]] = {}
    for rnd in range(4):
        for name, fn in variants.items():
            ms = timed(fn)
            res.setdefault(name, []).append(ms)
            print(json.dumps({"round": rnd, "cfg": name, "ms": round(ms, 2)}), flush=True)
    for name, vals in res.items():
        med = float(np.median(vals))
        print(
            json.dumps(
                {"cfg": name, "median_ms": round(med, 2),
                 "pairs_per_sec": round(batch / (med / 1e3), 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
