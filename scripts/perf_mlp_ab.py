"""A/B: GeGLU fused into Wo2 (XLA default) vs split via optimization_barrier.

The profiler shows the [16384,1152]@[1152,768] Wo2 matmul at 3x off peak when
XLA input-fuses the gelu-gate into it (0.436 ms vs 0.147 SoL). This measures
the full forward with the GeGLU materialized separately.
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

    import open_provence_tpu.models.modernbert as mb
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
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 50000, (32, 512)).astype(np.int32))
    mask = jnp.ones((32, 512), dtype=jnp.int32)

    def timed(fn, iters=12):
        r = fn(params, ids, mask)
        jax.device_get(r)
        start = time.perf_counter()
        outs = [fn(params, ids, mask) for _ in range(iters)]
        jax.device_get(outs)
        return (time.perf_counter() - start) / iters * 1e3

    import flax.linen as nn

    class BarrierMLP(nn.Module):
        config: object

        @nn.compact
        def __call__(self, x, *, deterministic=True):
            cfg = self.config
            wi = nn.Dense(2 * cfg.intermediate_size, use_bias=cfg.mlp_bias, name="Wi")(x)
            inp, gate = jnp.split(wi, 2, axis=-1)
            hidden = mb.get_activation(cfg.hidden_activation)(inp) * gate
            hidden = jax.lax.optimization_barrier(hidden)
            return nn.Dense(cfg.hidden_size, use_bias=cfg.mlp_bias, name="Wo")(hidden)

    orig_mlp = mb.ModernBertMLP

    def make(use_barrier):
        mb.ModernBertMLP = BarrierMLP if use_barrier else orig_mlp
        mod = build_module(config)

        @jax.jit
        def fwd(p, i, m):
            out = mod.apply({"params": p}, i, m, deterministic=True, attention_impl="auto")
            return out["ranking_logits"]

        return fwd

    base = make(False)
    barrier = make(True)
    res = {}
    for rnd in range(3):
        for name, fn in (("default", base), ("barrier", barrier)):
            ms = timed(fn)
            res.setdefault(name, []).append(ms)
            print(json.dumps({"round": rnd, "cfg": name, "ms": round(ms, 2)}), flush=True)
    for name, vals in res.items():
        print(json.dumps({"cfg": name, "median_ms": round(float(np.median(vals)), 2)}), flush=True)
    mb.ModernBertMLP = orig_mlp


if __name__ == "__main__":
    main()
