"""Benchmark: query–context pairs/sec/chip on the flagship forward.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference has no direct counterpart metric; its closest proxy is the
per-dataset `inference_seconds` on an RTX 5090 (BASELINE.md). The anchor used
for vs_baseline: the reference "base" model (ModernBERT-base, 130M) processes
the EN eval suite's ~560 blocks of ≤512 tokens in ~0.69 s → ≈810 pairs/sec on
an RTX 5090. vs_baseline = our pairs/sec / 810.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 810.0


def _wait_for_device(attempts: int | None = None, probe_timeout_s: int | None = None) -> None:
    """Device discovery over the axon tunnel can HANG in native code (not
    error) while the tunnel is down — a SIGALRM watchdog never fires because
    the GIL is held. Probe in a SUBPROCESS under a timeout and retry with
    backoff so a transiently-down tunnel doesn't wedge the whole bench run;
    exhausted retries raise (no JSON is printed — a crash is honest, a
    made-up number is not). The tunnel has stayed down for multi-hour
    stretches, so default patience is ~30 min; override with
    OPEN_PROVENCE_TPU_BENCH_PROBES / _PROBE_TIMEOUT_S."""
    import os
    import subprocess
    import sys

    if attempts is None:
        attempts = int(os.environ.get("OPEN_PROVENCE_TPU_BENCH_PROBES", "10"))
    if probe_timeout_s is None:
        probe_timeout_s = int(
            os.environ.get("OPEN_PROVENCE_TPU_BENCH_PROBE_TIMEOUT_S", "150")
        )
    for attempt in range(attempts):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s,
                check=True,
                capture_output=True,
            )
            return
        except Exception as exc:
            if attempt == attempts - 1:
                raise RuntimeError(
                    f"TPU device discovery failed after {attempts} probes "
                    f"({probe_timeout_s}s each) — the axon tunnel appears "
                    "down. No JSON emitted (an unmeasured number would be "
                    "dishonest); the most recent REAL measurements are "
                    "committed in benchmarks/bench_suite_tpu.json."
                ) from exc
            time.sleep(min(60, 10 * (attempt + 1)))


def main() -> None:
    _wait_for_device()
    import jax

    from __graft_entry__ import _flagship_config
    from open_provence_tpu.models.model import build_module
    import jax.numpy as jnp

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

    platform = jax.devices()[0].platform
    attention_impl = "auto"

    @jax.jit
    def forward(params, input_ids, attention_mask):
        out = module.apply(
            {"params": params},
            input_ids,
            attention_mask,
            deterministic=True,
            attention_impl=attention_impl,
        )
        from open_provence_tpu.models.model import (
            keep_probs_from_logits,
            ranking_score_from_logits,
        )

        # Compact outputs: the timed loop fetches them WHOLE. Slicing device
        # arrays on the host side (o[0][0]) would enqueue an extra tiny
        # device program per output — ~40 tunnel round trips inside the
        # timed window, which dominated the measurement.
        return (
            ranking_score_from_logits(out["ranking_logits"]),
            keep_probs_from_logits(out["pruning_logits"])[:, 0],
        )

    batch, seq = (32, 512) if platform == "tpu" else (4, 128)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 50000, size=(batch, seq)).astype(np.int32)
    attention_mask = jnp.ones((batch, seq), dtype=jnp.int32)

    iters = 20 if platform == "tpu" else 3
    # Distinct pre-staged inputs: defeats any identical-call caching in the
    # device tunnel.
    inputs = [jnp.asarray(np.roll(base, i, axis=1)) for i in range(iters)]
    jax.device_get([x[0, 0] for x in inputs])  # ensure inputs are staged

    # Warmup/compile + full host fetch (block_until_ready is not a reliable
    # sync point over the axon tunnel; only device_get is).
    r, k = forward(params, inputs[0], attention_mask)
    jax.device_get((r, k))

    start = time.perf_counter()
    outs = [forward(params, ids, attention_mask) for ids in inputs]
    # Fetch every iteration's (small) outputs whole — forces execution of
    # every step before the clock stops without per-output slice dispatches.
    fetched = jax.device_get(outs)
    elapsed = time.perf_counter() - start
    assert all(
        np.isfinite(np.asarray(arr)).all() for pair in fetched for arr in pair
    )

    pairs_per_sec = batch * iters / elapsed

    payload = {
        "metric": "qc_pairs_per_sec_per_chip_base512",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
    }
    e2e = _process_e2e_pairs_per_sec()
    if e2e is not None:
        payload["e2e_pairs_per_sec"] = round(e2e, 1)
    print(json.dumps(payload))


def _process_e2e_pairs_per_sec() -> float | None:
    """End-to-end process() throughput on the bench_suite synthetic workload
    (text in → pruned text out, host prep + device + postprocess). Reported
    alongside the forward headline so the driver records what users actually
    get; None (field omitted) if anything in the e2e path fails."""
    try:
        import sys
        import tempfile
        from pathlib import Path

        import jax
        import jax.numpy as jnp

        sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
        import bench_suite
        from make_toy_assets import build_tokenizer

        import open_provence_tpu as op
        from open_provence_tpu.inference import OpenProvenceModel
        from open_provence_tpu.models.model import build_module

        with tempfile.TemporaryDirectory() as tmp:
            tokenizer, vocab_size = build_tokenizer(Path(tmp))
            backbone = op.ModernBertBackboneConfig(
                vocab_size=vocab_size + 64, num_labels=1
            )
            config = op.OpenProvenceConfig(
                base_model_config=backbone.to_dict(),
                num_labels=1,
                pruning_config={"hidden_size": 768, "classifier_dropout": 0.0},
                max_length=512,
            )
            module = build_module(config)
            params = module.init(
                jax.random.PRNGKey(0),
                np.zeros((1, 8), dtype=np.int32),
                np.ones((1, 8), dtype=np.int32),
                attention_impl="xla",
            )["params"]
            dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else None
            model = OpenProvenceModel(config, params, tokenizer, dtype=dtype)
            # 256-pair workload: big enough to amortize the fixed ~30 ms
            # axon-tunnel round trip per call, which is an artifact of the
            # bench environment rather than the engine (co-located serving
            # pays ~none of it).
            entry = bench_suite.bench_process(model, n_pairs=256, iters=4)
            return float(entry["pairs_per_sec"])
    except Exception:
        return None


if __name__ == "__main__":
    main()
