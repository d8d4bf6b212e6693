#!/usr/bin/env python3
"""One train-step timing in ONE process (whole-model A/Bs must not alternate
executables in-process — program-reload thrash, see CLAUDE.md traps).

Usage: python scripts/perf_train_sweep.py --pairs 64 [--remat] \
    [--bwd-blocks 512,512] [--bwd-impl pallas|xla] [--iters 12] [--fwd-only]

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bwd-blocks", default=None, help='"bq,bk" for the FA2 backward')
    ap.add_argument("--bwd-impl", default=None, choices=["pallas", "xla"])
    ap.add_argument("--fwd-only", action="store_true",
                    help="time loss forward only (no grad/optimizer)")
    ap.add_argument("--grad-only", action="store_true",
                    help="time value_and_grad without the optimizer update")
    ap.add_argument("--grad-trainer-like", action="store_true",
                    help="grad with fp32 masters + in-graph bf16 cast + dropout "
                         "rng (the trainer's exact loss graph, no optimizer)")
    ap.add_argument("--tl-deterministic", action="store_true",
                    help="with --grad-trainer-like: keep fp32 masters + cast "
                         "but run deterministic (no dropout rng) — isolates "
                         "the cast cost from the dropout/RNG cost")
    ap.add_argument("--opt-step", action="store_true",
                    help="trainer-identical jitted step (grad + adafactor + "
                         "donation) driven with a pre-staged device batch — "
                         "isolates in-graph cost from per-step host dispatch")
    args = ap.parse_args()

    if args.bwd_blocks:
        os.environ["OPEN_PROVENCE_TPU_BWD_BLOCKS"] = args.bwd_blocks
    if args.bwd_impl:
        os.environ["OPEN_PROVENCE_TPU_FLASH_BWD"] = args.bwd_impl

    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import numpy as np

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

    label = {
        "pairs": args.pairs,
        "remat": args.remat,
        "bwd_blocks": args.bwd_blocks,
        "bwd_impl": args.bwd_impl or "pallas",
        "mode": (
            "fwd" if args.fwd_only
            else "grad" if args.grad_only
            else (
                "grad_trainer_like_det" if args.tl_deterministic
                else "grad_trainer_like"
            ) if args.grad_trainer_like
            else "opt_step" if args.opt_step
            else "step"
        ),
    }

    if args.fwd_only or args.grad_only or args.grad_trainer_like:
        entry = _bench_loss_graph(config, params, args)
    elif args.opt_step:
        entry = _bench_opt_step(config, params, args)
    else:
        sys.path.insert(0, str(REPO_ROOT / "scripts"))
        from bench_suite import bench_train_step

        try:
            entry = bench_train_step(
                config, params, pairs=args.pairs, seq=args.seq,
                iters=args.iters, remat=args.remat,
            )
        except Exception as exc:  # compile OOM etc. — report, don't crash
            entry = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    print(json.dumps({**label, **entry}), flush=True)


def _bench_loss_graph(config, params, args):
    """Time just the loss graph (optionally its grad) with the same batch
    semantics as the trainer, isolating fwd vs bwd cost from the optimizer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_provence_tpu.models.model import build_module
    from open_provence_tpu.train.losses import joint_loss

    module = build_module(config)
    trainer_like = getattr(args, "grad_trainer_like", False)
    if not trainer_like:
        # plain mode: bf16 params, differentiate in bf16
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )

    rng = np.random.default_rng(0)
    pairs, seq = args.pairs, args.seq
    labels = rng.integers(0, 2, size=(pairs, seq))
    labels[:, :8] = -100
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 50000, size=(pairs, seq)), jnp.int32),
        "attention_mask": jnp.ones((pairs, seq), jnp.int32),
        "pruning_labels": jnp.asarray(labels, jnp.int32),
        "ranking_targets": jnp.asarray(rng.uniform(size=(pairs,)), jnp.float32),
        "pair_mask": jnp.ones((pairs,), jnp.float32),
    }

    tl_dropout = trainer_like and not getattr(args, "tl_deterministic", False)

    def loss_fn(p, b, dropout_rng=None):
        if trainer_like:
            # the trainer's exact loss graph: fp32 masters cast in-graph,
            # dropout rngs threaded (trainer.py::_loss_for_batch)
            p = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                p,
            )
        out = module.apply(
            {"params": p}, b["input_ids"], b["attention_mask"],
            deterministic=not tl_dropout, attention_impl="auto",
            remat=args.remat,
            rngs={"dropout": dropout_rng} if tl_dropout else None,
        )
        loss, _ = joint_loss(out, b)
        return loss

    if trainer_like:

        def _grad_probe_tl(p, b, rng_key):
            loss, grads = jax.value_and_grad(loss_fn)(p, b, rng_key)
            gsum = jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), grads, 0.0
            )
            return loss, gsum

        fn0 = jax.jit(_grad_probe_tl)
        key = jax.random.PRNGKey(0)
        fn = lambda p, b: fn0(p, b, key)  # noqa: E731
    elif args.grad_only:
        # The grads must feed the output or XLA dead-code-eliminates the
        # whole backward; a scalar tree-sum forces every dgrad while adding
        # only one elementwise pass (~1 ms at these sizes) and keeps the
        # host fetch tiny (fetching the 600 MB grad tree over the tunnel
        # would dominate the measurement).
        def _grad_probe(p, b):
            loss, grads = jax.value_and_grad(loss_fn)(p, b)
            gsum = jax.tree.reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), grads, 0.0
            )
            return loss, gsum

        fn = jax.jit(_grad_probe)
    else:
        fn = jax.jit(loss_fn)

    jax.device_get(fn(params, batch))
    jax.device_get(fn(params, batch))
    start = time.perf_counter()
    outs = [fn(params, batch) for _ in range(args.iters)]
    jax.device_get(outs)
    elapsed = (time.perf_counter() - start) / args.iters
    return {
        "ms_per_step": round(elapsed * 1000, 2),
        "pairs_per_sec": round(pairs / elapsed, 1),
    }


def _bench_opt_step(config, params, args):
    """Trainer-identical jitted step (fp32 masters, in-graph bf16 cast,
    dropout rng, global-norm clip + adafactor, donated buffers) driven with a
    PRE-STAGED device batch and a fixed rng — so any gap vs bench_train_step
    is per-step host dispatch (device_put per key + rng split), and any gap
    vs --grad-trainer-like is the optimizer update itself."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from open_provence_tpu.models.model import build_module
    from open_provence_tpu.train.losses import joint_loss
    from open_provence_tpu.train.trainer import make_optimizer

    module = build_module(config)
    optimizer = make_optimizer(learning_rate=5e-5, total_steps=1000)

    rng = np.random.default_rng(0)
    pairs, seq = args.pairs, args.seq
    labels = rng.integers(0, 2, size=(pairs, seq))
    labels[:, :8] = -100
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 50000, size=(pairs, seq)), jnp.int32),
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

    params, opt_state, m = jit_step(params, opt_state, batch, key)  # compile 1
    params, opt_state, m = jit_step(params, opt_state, batch, key)  # compile 2 (tiled layouts)
    jax.device_get(m["loss"])
    import time as _time

    start = _time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, m = jit_step(params, opt_state, batch, key)
    m = jax.device_get(m)
    elapsed = (_time.perf_counter() - start) / args.iters
    return {
        "ms_per_step": round(elapsed * 1000, 2),
        "pairs_per_sec": round(pairs / elapsed, 1),
        "loss": round(float(m["loss"]), 4),
    }


if __name__ == "__main__":
    main()
