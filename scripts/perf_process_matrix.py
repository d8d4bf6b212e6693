"""Process() e2e experiment matrix on the 256-pair synthetic workload.

Variants: default (auto workers, pipeline on), pipeline off, and explicit
preprocess_workers values. Each variant's calls run consecutively (one set
of device executables is shared across variants — only host behavior
differs), median-of-calls per variant, with the phase stopwatch printed.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from open_provence_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from make_toy_assets import build_tokenizer

    import open_provence_tpu as op
    from open_provence_tpu.inference import OpenProvenceModel
    from open_provence_tpu.models.model import build_module

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    # Different batch sizes bucket into different jitted executables —
    # A/B them ACROSS processes (one size per run), not within one.
    batch_size = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    with tempfile.TemporaryDirectory() as tmp:
        tokenizer, vocab_size = build_tokenizer(Path(tmp))
        backbone = op.ModernBertBackboneConfig(vocab_size=vocab_size + 64, num_labels=1)
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

        rng = np.random.default_rng(0)
        words = "sushi ramen kyoto market travel budget deadline plants river temple".split()
        questions = [f"what about {rng.choice(words)} ?" for _ in range(n_pairs)]
        contexts = [
            " ".join(
                f"sentence {i} about {rng.choice(words)} and {rng.choice(words)} ."
                for i in range(24)
            )
            for _ in range(n_pairs)
        ]

        def run(tag: str, *, pipeline: bool, workers: int | None) -> None:
            os.environ["OPEN_PROVENCE_TPU_PIPELINE"] = "1" if pipeline else "0"
            kwargs = {"batch_size": batch_size}
            if workers is not None:
                kwargs["preprocess_workers"] = workers
            # warm twice
            model.process(questions, contexts, threshold=0.1, show_progress=False, **kwargs)
            model.process(questions, contexts, threshold=0.1, show_progress=False, **kwargs)
            times, traces = [], []
            for _ in range(iters):
                start = time.perf_counter()
                out = model.process(
                    questions, contexts, threshold=0.1, show_progress=False, **kwargs
                )
                times.append(time.perf_counter() - start)
                traces.append(out["performance_trace"].as_dict())
            med = float(np.median(times))
            best = int(np.argmin(times))
            tr = traces[best]
            print(
                json.dumps(
                    {
                        "variant": tag,
                        "batch_size": batch_size,
                        "median_s": round(med, 4),
                        "best_s": round(min(times), 4),
                        "pairs_per_sec": round(n_pairs / med, 1),
                        "trace_best": {k: round(v, 4) for k, v in tr.items() if v},
                    }
                ),
                flush=True,
            )

        run("default", pipeline=True, workers=None)
        run("pipeline_off", pipeline=False, workers=None)
        for w in (2, 4, 8):
            run(f"workers{w}", pipeline=True, workers=w)
        run("default_again", pipeline=True, workers=None)


if __name__ == "__main__":
    main()
