"""End-to-end pytest of the train CLI (VERDICT r3 #5).

Runs ``python -m open_provence_tpu.train.cli`` as a subprocess on a shrunken
toy config (tiny 2-layer backbone, 12 rows, ~6 steps) and asserts the full
runner surface (reference trainer.py:1389-1737, test strategy SURVEY §4):
checkpoints written, final_model exported, CLI field overrides applied,
eval_datasets hook produces reports, and both OpenProvenceModel and
OpenProvenceEncoder reload the exported artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    """Build tiny assets + config, run the CLI once, share across tests."""
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    import make_toy_assets

    root = tmp_path_factory.mktemp("train_cli")
    backbone_dir = root / "backbone"
    _, vocab_size = make_toy_assets.build_tokenizer(backbone_dir)
    make_toy_assets.build_backbone_dir(backbone_dir, vocab_size)
    # Shrink to 2 layers for 1-core compile speed; keep the toy schema.
    cfg = json.loads((backbone_dir / "config.json").read_text())
    cfg["num_hidden_layers"] = 2
    cfg["max_position_embeddings"] = 128
    (backbone_dir / "config.json").write_text(json.dumps(cfg))
    tokenizer, _ = make_toy_assets.build_tokenizer(backbone_dir)
    make_toy_assets.build_dataset(root / "dataset", tokenizer, rows=12, seed=0)

    eval_config = root / "eval_toy.yaml"
    eval_config.write_text(
        "split: validation\n"
        "datasets:\n"
        f'  - dataset_name: "{root / "dataset"}"\n'
        "    n_samples: 4\n"
    )
    out_dir = root / "out"
    train_config = root / "train_toy.yaml"
    train_config.write_text(
        f"""
model_args:
  model_name_or_path: "{backbone_dir}"
  classifier_dropout: 0.1
  max_length: 64

data_args:
  dataset_name: "{root / "dataset"}"
  teacher_column: "teacher_score"

training_args:
  output_dir: "{out_dir}"
  optimizer: "adafactor"
  learning_rate: 1.0e-3
  per_device_train_batch_size: 2
  gradient_accumulation_steps: 1
  logging_steps: 2
  eval_steps: 3
  save_steps: 3
  save_total_limit: 2
  bf16: false
  load_best_model_at_end: false
  num_train_epochs: 1
  per_device_eval_batch_size: 2
  report_to: []
  attention_impl: "xla"
  eval_datasets:
    config: "{eval_config}"
    threshold: 0.1
    batch_size: 8
"""
    )

    env = dict(os.environ)
    env["OPEN_PROVENCE_TPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    # Single CPU device in the subprocess: the 8-device virtual mesh only
    # slows the tiny compile down; mesh coverage lives in test_tensor_parallel.
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "open_provence_tpu.train.cli",
            str(train_config),
            # CLI override must win over the YAML value (runner.py:317-350).
            "--learning_rate",
            "5e-4",
        ],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    return proc, out_dir


def test_cli_exits_zero(toy_run):
    proc, _ = toy_run
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]


def test_checkpoints_written(toy_run):
    _, out_dir = toy_run
    checkpoints = sorted(p.name for p in out_dir.glob("checkpoint-*"))
    assert checkpoints, list(out_dir.iterdir())
    # save_total_limit=2 rotation keeps at most two.
    assert len(checkpoints) <= 2
    latest = max(out_dir.glob("checkpoint-*"), key=lambda p: int(p.name.split("-")[1]))
    assert (latest / "train_state").exists()
    assert (latest / "trainer_state.json").exists()


def test_final_model_exported_with_override(toy_run):
    _, out_dir = toy_run
    final = out_dir / "final_model"
    assert (final / "config.json").exists()
    assert (final / "model.safetensors").exists()
    assert (final / "tokenizer.json").exists()
    recorded = json.loads((final / "training_args.json").read_text())
    assert float(recorded["training_args"]["learning_rate"]) == pytest.approx(5e-4)


def test_eval_datasets_hook_produced_reports(toy_run):
    _, out_dir = toy_run
    eval_dir = out_dir / "final_model" / "eval_datasets"
    results = json.loads((eval_dir / "results.json").read_text())
    assert results, results
    report = (eval_dir / "results.md").read_text()
    assert "F2" in report or "f2" in report


def test_eval_datasets_model_flag_runs_eval_only(toy_run):
    """--eval-datasets-model <path> must skip training and run only the
    eval hook against the given model (reference runner.py:196-209)."""
    proc, out_dir = toy_run
    final = out_dir / "final_model"
    results = final / "eval_datasets" / "results.json"
    before = results.stat().st_mtime
    config_path = str(out_dir.parent / "train_toy.yaml")
    env = dict(os.environ)
    env["OPEN_PROVENCE_TPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    rerun = subprocess.run(
        [
            sys.executable,
            "-m",
            "open_provence_tpu.train.cli",
            config_path,
            "--eval-datasets-model",
            str(final),
        ],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert rerun.returncode == 0, rerun.stdout[-2000:] + rerun.stderr[-2000:]
    # No new checkpoints (training skipped), but the eval reports refreshed.
    assert results.stat().st_mtime > before
    assert json.loads(results.read_text())


def test_final_model_reloads_in_model_and_encoder(toy_run):
    _, out_dir = toy_run
    final = out_dir / "final_model"
    from transformers import AutoTokenizer

    from open_provence_tpu.encoder import OpenProvenceEncoder
    from open_provence_tpu.inference import OpenProvenceModel

    tokenizer = AutoTokenizer.from_pretrained(str(final))
    model = OpenProvenceModel.from_pretrained(
        final, tokenizer=tokenizer, attention_impl="xla", bucket_step=16
    )
    result = model.process(
        "what about sushi ?", "sushi market dish . travel spring budget .",
        threshold=0.0,
    )
    assert result["pruned_context"] == "sushi market dish . travel spring budget ."

    encoder = OpenProvenceEncoder.from_pretrained(
        final, tokenizer=tokenizer, attention_impl="xla"
    )
    scores = encoder.predict([("what about sushi ?", "sushi market dish .")])
    assert len(scores) == 1


def test_loss_trajectory_anchor(toy_run):
    """Loss-curve sanity anchor (VERDICT r3 weak #6; docs/train.md "Toy
    training anchor"): the logged trajectory must have the same shape as the
    reference's toy health check (its docs/train.md:129-136) — total loss
    dominated by the pruning term, finite everywhere, decreasing at eval
    points, and ending meaningfully below where it started."""
    import math

    _, out_dir = toy_run
    checkpoints = sorted(
        out_dir.glob("checkpoint-*"), key=lambda p: int(p.name.split("-")[1])
    )
    state = json.loads((checkpoints[-1] / "trainer_state.json").read_text())
    history = state["log_history"]
    train_pts = [h for h in history if "loss" in h]
    eval_pts = [h for h in history if "eval_loss" in h]
    assert train_pts and eval_pts

    for h in train_pts + eval_pts:
        for v in h.values():
            assert math.isfinite(float(v)), h

    # pruning dominates the joint loss (weights 1.0 vs 0.05-on-MSE)
    for h in train_pts:
        assert h["pruning_loss"] > 0.5 * h["loss"], h

    # eval_loss improves across eval points; train loss ends below start
    eval_losses = [h["eval_loss"] for h in eval_pts]
    assert eval_losses[-1] <= eval_losses[0] + 1e-6, eval_losses
    assert train_pts[-1]["loss"] < train_pts[0]["loss"], train_pts
