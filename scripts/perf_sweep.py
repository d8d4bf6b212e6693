"""One-process A/B perf sweep on the real chip.

Alternates configurations within a single process (axon-tunnel variance makes
separate runs incomparable — see CLAUDE.md perf notes). Prints one JSON line
per config with pairs/s at the bench shape family.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_forward(module, attention_impl):
    import jax

    from open_provence_tpu.models.model import (
        keep_probs_from_logits,
        ranking_score_from_logits,
    )

    @jax.jit
    def forward(params, input_ids, attention_mask):
        out = module.apply(
            {"params": params},
            input_ids,
            attention_mask,
            deterministic=True,
            attention_impl=attention_impl,
        )
        return (
            ranking_score_from_logits(out["ranking_logits"]),
            keep_probs_from_logits(out["pruning_logits"])[:, 0],
        )

    return forward


def time_config(forward, params, batch, seq, iters):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    base = rng.integers(0, 50000, size=(batch, seq)).astype(np.int32)
    mask = jnp.ones((batch, seq), dtype=jnp.int32)
    inputs = [jnp.asarray(np.roll(base, i, axis=1)) for i in range(iters)]
    jax.device_get([x[0, 0] for x in inputs])
    r, k = forward(params, inputs[0], mask)
    jax.device_get((r, k))
    start = time.perf_counter()
    outs = [forward(params, ids, mask) for ids in inputs]
    jax.device_get(outs)
    elapsed = time.perf_counter() - start
    return batch * iters / elapsed


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="32,64,128")
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--impls", default="auto")
    args = parser.parse_args()

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
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )

    batches = [int(b) for b in args.batches.split(",")]
    impls = args.impls.split(",")
    results: dict[str, list[float]] = {}
    for rnd in range(args.rounds):
        for impl in impls:
            forward = build_forward(module, impl)
            for batch in batches:
                iters = max(4, args.iters * 32 // batch)
                pps = time_config(forward, params, batch, args.seq, iters)
                key = f"impl={impl} B={batch}"
                results.setdefault(key, []).append(pps)
                print(
                    json.dumps(
                        {
                            "round": rnd,
                            "config": key,
                            "pairs_per_sec": round(pps, 2),
                        }
                    ),
                    flush=True,
                )
    print("--- medians ---")
    for key, vals in results.items():
        print(
            json.dumps({"config": key, "median_pairs_per_sec": round(float(np.median(vals)), 2)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
