"""Capture a jax.profiler trace of the base-512 forward and summarize op time.

Parses the xplane proto via tensorboard_plugin_profile if available; otherwise
leaves the raw trace under --out for offline inspection.
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from open_provence_tpu.models.model import build_module

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/op_tpu_profile"

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

    @jax.jit
    def forward(p, i, m):
        out = module.apply({"params": p}, i, m, deterministic=True, attention_impl="auto")
        return out["ranking_logits"], out["pruning_logits"]

    r = forward(params, ids, mask)
    jax.device_get(r)

    with jax.profiler.trace(out_dir):
        for _ in range(5):
            r = forward(params, ids, mask)
        jax.device_get(r)

    print("trace written to", out_dir)
    for f in glob.glob(out_dir + "/**/*.xplane.pb", recursive=True):
        print("xplane:", f, os.path.getsize(f))


if __name__ == "__main__":
    main()
