"""Capture a jax.profiler trace of the full train step and summarize op time.

Same harness as perf_train_sweep's step mode (trainer-identical jitted step,
donated buffers, pre-staged batch) with a profiler window around the steady
state. Summarize the resulting xplane with scripts/xplane_summary.py.

Usage: python scripts/perf_train_profile.py [--pairs 64] [--out DIR]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--out", default="/tmp/op_tpu_train_profile")
    args = ap.parse_args()

    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_config
    from open_provence_tpu.models.model import build_module
    from open_provence_tpu.train.losses import joint_loss
    from open_provence_tpu.train.trainer import make_optimizer

    config = _flagship_config()
    module = build_module(config)
    params = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    optimizer = make_optimizer(learning_rate=5e-5, total_steps=1000)

    rng = np.random.default_rng(0)
    pairs, seq = args.pairs, args.seq
    labels = rng.integers(0, 2, size=(pairs, seq))
    labels[:, :8] = -100
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, 50000, size=(pairs, seq)), jnp.int32
        ),
        "attention_mask": jnp.ones((pairs, seq), jnp.int32),
        "pruning_labels": jnp.asarray(labels, jnp.int32),
        "ranking_targets": jnp.asarray(rng.uniform(size=(pairs,)), jnp.float32),
        "pair_mask": jnp.ones((pairs,), jnp.float32),
    }

    def loss_fn(p, b, dropout_rng):
        cp = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            p,
        )
        out = module.apply(
            {"params": cp}, b["input_ids"], b["attention_mask"],
            deterministic=False, attention_impl="auto", remat=args.remat,
            rngs={"dropout": dropout_rng},
        )
        loss, comps = joint_loss(out, b)
        return loss, comps

    def step(p, opt_state, b, dropout_rng):
        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, b, dropout_rng
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, p)
        new_params = optax.apply_updates(p, updates)
        return new_params, new_opt_state, {"loss": loss, **comps}

    jit_step = jax.jit(step, donate_argnums=(0, 1))
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)

    params, opt_state, m = jit_step(params, opt_state, batch, key)
    params, opt_state, m = jit_step(params, opt_state, batch, key)
    jax.device_get(m["loss"])

    # Fetch OUTSIDE the trace window: a device_get inside it hits
    # FAILED_PRECONDITION over the axon tunnel. The dispatched steps are
    # serialized on-device, so the post-trace fetch still bounds them.
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            params, opt_state, m = jit_step(params, opt_state, batch, key)
        import time as _t

        _t.sleep(float(args.iters) * 0.4)  # let device work land in the trace
    jax.device_get(m["loss"])

    print("trace written to", args.out)
    for f in glob.glob(args.out + "/**/*.xplane.pb", recursive=True):
        print("xplane:", f, os.path.getsize(f))


if __name__ == "__main__":
    main()
