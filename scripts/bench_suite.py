#!/usr/bin/env python3
"""Extended benchmark suite (bench.py stays single-metric for the driver).

Measures on the current JAX device:
* two-head forward throughput (pairs/s) at several (batch, seq) shapes,
* end-to-end process() throughput on synthetic long documents (includes the
  host text pipeline, bucketing, and device pooling).

Timing uses per-iteration output fetches — block_until_ready is not a
reliable sync point over the axon TPU tunnel.

Usage: python scripts/bench_suite.py [--out bench_suite.json]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def bench_forward(module, params, batch, seq, iters=8):
    import jax
    import jax.numpy as jnp

    fn = jax.jit(
        lambda p, i, m: module.apply(
            {"params": p}, i, m, deterministic=True, attention_impl="auto"
        )["ranking_logits"]
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 50000, size=(batch, seq)).astype(np.int32)
    mask = jnp.ones((batch, seq), dtype=jnp.int32)
    inputs = [jnp.asarray(np.roll(base, i, axis=1)) for i in range(iters)]
    jax.device_get([x[0, 0] for x in inputs])
    # Warm up twice, fetch outputs WHOLE (host-side slicing enqueues one
    # tiny device program per output — a tunnel dispatch inside the timed
    # window; see CLAUDE.md measurement traps).
    jax.device_get(fn(params, inputs[0], mask))
    jax.device_get(fn(params, inputs[0], mask))
    start = time.perf_counter()
    outs = [fn(params, x, mask) for x in inputs]
    jax.device_get(outs)
    elapsed = (time.perf_counter() - start) / iters
    return {
        "batch": batch,
        "seq": seq,
        "ms_per_batch": round(elapsed * 1000, 2),
        "pairs_per_sec": round(batch / elapsed, 1),
        "tokens_per_sec": round(batch * seq / elapsed, 0),
    }


def bench_process(model, n_pairs=32, sentences_per_doc=24, iters=10):
    rng = np.random.default_rng(0)
    words = "sushi ramen kyoto market travel budget deadline plants river temple".split()
    questions = [f"what about {rng.choice(words)} ?" for _ in range(n_pairs)]
    contexts = [
        " ".join(
            f"sentence {i} about {rng.choice(words)} and {rng.choice(words)} ."
            for i in range(sentences_per_doc)
        )
        for _ in range(n_pairs)
    ]
    # Warmup twice (compiles the buckets; second run settles jit caches).
    model.process(questions, contexts, threshold=0.1, show_progress=False)
    model.process(questions, contexts, threshold=0.1, show_progress=False)
    # Median of per-call times: the axon tunnel's round-trip latency is
    # bimodal (single loops measure up to 2x apart — CLAUDE.md traps).
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        result = model.process(questions, contexts, threshold=0.1, show_progress=False)
        times.append(time.perf_counter() - start)
    elapsed = float(np.median(times))
    trace = result["performance_trace"]
    return {
        "n_pairs": n_pairs,
        "sentences_per_doc": sentences_per_doc,
        "seconds_per_call": round(elapsed, 3),
        "seconds_per_call_p10_p90": [
            round(float(np.percentile(times, 10)), 3),
            round(float(np.percentile(times, 90)), 3),
        ],
        "pairs_per_sec": round(n_pairs / elapsed, 1),
        "inference_seconds": round(trace.inference_seconds, 3),
        "preprocess_seconds": round(trace.preprocess_seconds, 3),
        "postprocess_seconds": round(trace.postprocess_seconds, 3),
    }


def bench_train_step(config, params, pairs=256, seq=512, iters=4, remat=True,
                     accum=1):
    """Full train step (fwd+bwd+adafactor) timing — anchor for wall-clock
    comparisons against the reference's single-GPU hours (BASELINE.md).

    ``remat=True`` measures the large-batch rematerialized step;
    ``remat=False`` with a small ``pairs`` measures the shipped-config
    recipe (full training YAMLs run per-device batch 32 with
    gradient_checkpointing: false — see configs/). ``accum>1`` splits
    ``pairs`` into that many lax.scan microbatches inside ONE jitted
    dispatch — emulates a 2x larger batch without tripping the axon remote
    compile helper's b96+/b128 failure (VERDICT r4 missing #4)."""
    import jax

    from open_provence_tpu.train.trainer import OpenProvenceTrainer
    from open_provence_tpu.parallel.mesh import create_mesh

    trainer = OpenProvenceTrainer(
        config,
        params,
        tokenizer=None,
        output_dir="/tmp/op_tpu_bench_train",
        learning_rate=5e-5,
        total_steps=1000,
        bf16=True,
        gradient_checkpointing=remat,
        gradient_accumulation_steps=accum,
        mesh=create_mesh(),
        attention_impl="auto",
    )
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, size=(pairs, seq))
    labels[:, :8] = -100
    batch = {
        "input_ids": rng.integers(0, 50000, size=(pairs, seq)).astype(np.int32),
        "attention_mask": np.ones((pairs, seq), dtype=np.int32),
        "pruning_labels": labels.astype(np.int64),
        "ranking_targets": rng.uniform(size=(pairs,)).astype(np.float32),
        "pair_mask": np.ones((pairs,), dtype=np.float32),
        "batch_indices": np.arange(pairs, dtype=np.int32),
        "doc_indices": np.zeros((pairs,), dtype=np.int32),
    }
    if accum > 1:
        assert pairs % accum == 0, (pairs, accum)
        micro = pairs // accum
        batch = [
            {k: v[i * micro : (i + 1) * micro] for k, v in batch.items()}
            for i in range(accum)
        ]
    # Two warmup steps, not one: the step donates params/opt_state, and the
    # first execution hands back arrays in the executable's preferred (tiled)
    # layouts, which differ from device_put defaults — so the SECOND call
    # recompiles once for the new layout signature and every later call hits
    # the cache. Timing from step 3 measures the steady state.
    trainer.train_one_step(batch)  # compile #1 (default layouts)
    trainer.train_one_step(batch)  # compile #2 (donated/tiled layouts)
    # Steps stream with sync=False (as trainer.train runs them between log
    # points); the single final fetch is the sync point for the whole loop.
    start = time.perf_counter()
    for _ in range(iters):
        metrics = trainer.train_one_step(batch, sync=False)
    metrics = jax.device_get(metrics)
    elapsed = (time.perf_counter() - start) / iters
    return {
        "pairs": pairs,
        "remat": remat,
        "seq": seq,
        "ms_per_step": round(elapsed * 1000, 2),
        "pairs_per_sec": round(pairs / elapsed, 1),
        "loss": round(float(metrics["loss"]), 4),
    }


def main() -> None:
    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=None)
    parser.add_argument("--skip-process", action="store_true")
    parser.add_argument("--train-step", action="store_true",
                        help="Also time the full train step (fwd+bwd+optimizer).")
    parser.add_argument("--only-process", action="store_true",
                        help="Run just the process() e2e bench and merge it into --out.")
    parser.add_argument("--families", action="store_true",
                        help="Also bench the xsmall (30M) and large (310M) "
                             "checkpoint-family scales (forward + train step), "
                             "merged into --out.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import open_provence_tpu as op
    from open_provence_tpu.models.model import build_module

    backbone = op.ModernBertBackboneConfig(num_labels=1)  # base scale
    config = op.OpenProvenceConfig(
        base_model_config=backbone.to_dict(),
        num_labels=1,
        pruning_config={"hidden_size": 768, "classifier_dropout": 0.0},
        max_length=512,
    )
    module = build_module(config)
    params_fp32 = module.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 8), dtype=np.int32),
        np.ones((1, 8), dtype=np.int32),
        attention_impl="xla",
    )["params"]
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params_fp32,
    )

    platform = jax.devices()[0].platform
    # Sections merge into an existing --out artifact: re-running one bench
    # (e.g. --only-process) keeps the others' entries.
    if args.out and args.out.exists():
        results = json.loads(args.out.read_text())
        results["platform"] = platform
    else:
        results = {"platform": platform, "model": "modernbert-base-149M"}

    shapes = [(32, 512), (8, 2048), (2, 8192)] if platform == "tpu" else [(4, 128)]
    if not args.only_process:
        results["forward"] = []
        for batch, seq in shapes:
            entry = bench_forward(module, params, batch, seq)
            results["forward"].append(entry)
            print(json.dumps(entry), flush=True)

    if args.train_step and not args.only_process:
        # Per-chip batch sweep: the adafactor update is per-param (batch-
        # independent), so larger no-remat batches amortize it; remat-256 is
        # the r01/r02 artifact shape for continuity. Headline "train_step" =
        # the fastest recipe that fits.
        sweep = [
            ("train_step_b32", dict(pairs=32, iters=16, remat=False)),
            ("train_step_b64", dict(pairs=64, iters=12, remat=False)),
            ("train_step_b128", dict(pairs=128, iters=8, remat=False)),
            # In-program accumulation: scan over b64 microbatches inside one
            # dispatch — the b128-equivalent batch the remote compile helper
            # can't build as a single program (HTTP 500).
            ("train_step_accum2x64", dict(pairs=128, iters=8, remat=False, accum=2)),
            ("train_step_accum4x64", dict(pairs=256, iters=4, remat=False, accum=4)),
            ("train_step_accum8x64", dict(pairs=512, iters=3, remat=False, accum=8)),
            ("train_step_accum16x64", dict(pairs=1024, iters=2, remat=False, accum=16)),
            ("train_step_remat256", dict(pairs=256, iters=4, remat=True)),
        ]
        best = None
        for name, kw in sweep:
            try:
                entry = bench_train_step(config, params_fp32, **kw)
            except Exception as exc:  # OOM at large no-remat batches is informative
                # First line only, ANSI escapes stripped — the raw axon
                # tunnel error embeds color codes and log timestamps.
                message = re.sub(r"\x1b\[[0-9;]*m", "", str(exc))
                entry = {"error": message.splitlines()[0][:160], **kw}
            results[name] = entry
            print(json.dumps({name: entry}), flush=True)
            if "pairs_per_sec" in entry and (
                best is None or entry["pairs_per_sec"] > best["pairs_per_sec"]
            ):
                best = entry
        if best is not None:
            results["train_step"] = best
            print(json.dumps({"train_step": best}), flush=True)

    if args.families and not args.only_process:
        # Public backbone dims of the reference's published checkpoint
        # families (reference README.md:28-33): xsmall = the 30M
        # modernbert-ja backbone (hidden 256, 10 layers, 4 heads),
        # large = the 310M backbone (hidden 768, 25 layers, 12 heads,
        # intermediate 3072). Vocab matters only for init cost here.
        fam_specs = {
            "xsmall": dict(hidden_size=256, intermediate_size=1024,
                           num_hidden_layers=10, num_attention_heads=4),
            "large": dict(hidden_size=768, intermediate_size=3072,
                          num_hidden_layers=25, num_attention_heads=12),
        }
        for fam, dims in fam_specs.items():
            fam_backbone = op.ModernBertBackboneConfig(num_labels=1, **dims)
            fam_config = op.OpenProvenceConfig(
                base_model_config=fam_backbone.to_dict(),
                num_labels=1,
                pruning_config={
                    "hidden_size": dims["hidden_size"],
                    "classifier_dropout": 0.0,
                },
                max_length=512,
            )
            fam_module = build_module(fam_config)
            fam_params_fp32 = fam_module.init(
                jax.random.PRNGKey(0),
                np.zeros((1, 8), dtype=np.int32),
                np.ones((1, 8), dtype=np.int32),
                attention_impl="xla",
            )["params"]
            fam_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                fam_params_fp32,
            )
            entry = bench_forward(fam_module, fam_params, 32, 512)
            results[f"forward_{fam}"] = entry
            print(json.dumps({f"forward_{fam}": entry}), flush=True)
            # large's b64 no-remat train graph crashes the axon remote
            # compile helper (host-side HTTP 500 in every kernel variant,
            # including all-pallas-off — measured r5); the threshold is the
            # microbatch BODY size: scanned 2x32 still 500s, scanned 4x16
            # compiles and is the fastest recipe (128.1 pairs/s vs b32's
            # 124.8 and b64+remat's 103.7) at FLOP-scaling parity with
            # base. Effective per-chip batch stays 64.
            fam_accum = 4 if fam == "large" else 1
            try:
                entry = bench_train_step(
                    fam_config, fam_params_fp32, pairs=64, iters=8,
                    remat=False, accum=fam_accum,
                )
                if fam_accum > 1:
                    entry["accum"] = fam_accum
            except Exception as exc:
                message = re.sub(r"\x1b\[[0-9;]*m", "", str(exc))
                entry = {"error": message.splitlines()[0][:160]}
            results[f"train_step_{fam}"] = entry
            print(json.dumps({f"train_step_{fam}": entry}), flush=True)

    if not args.skip_process:
        sys.path.insert(0, str(REPO_ROOT / "scripts"))
        from make_toy_assets import build_tokenizer
        import tempfile

        from open_provence_tpu.inference import OpenProvenceModel

        with tempfile.TemporaryDirectory() as tmp:
            tokenizer, vocab_size = build_tokenizer(Path(tmp))
            small_backbone = op.ModernBertBackboneConfig(
                vocab_size=vocab_size + 64, num_labels=1
            )
            small_config = op.OpenProvenceConfig(
                base_model_config=small_backbone.to_dict(),
                num_labels=1,
                pruning_config={"hidden_size": 768, "classifier_dropout": 0.0},
                max_length=512,
            )
            small_module = build_module(small_config)
            small_params = small_module.init(
                jax.random.PRNGKey(0),
                np.zeros((1, 8), dtype=np.int32),
                np.ones((1, 8), dtype=np.int32),
                attention_impl="xla",
            )["params"]
            model = OpenProvenceModel(
                small_config,
                small_params,
                tokenizer,
                dtype=jnp.bfloat16 if platform == "tpu" else None,
            )
            entry = bench_process(model)
            results["process"] = entry
            print(json.dumps(entry), flush=True)
            # Larger workload where the per-call tunnel round trip (~30 ms
            # fixed on axon) amortizes — closer to what co-located serving
            # would see per 32 pairs.
            entry = bench_process(model, n_pairs=256, iters=4)
            results["process_256"] = entry
            print(json.dumps(entry), flush=True)

    if args.out:
        args.out.write_text(json.dumps(results, indent=2))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
