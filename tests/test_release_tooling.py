"""Release tooling tests: standalone bundle portability (load checkpoint
with only the vendored files on sys.path), process smoke-check CLI, output
sync script."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def exported_checkpoint(tmp_path_factory):
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    from make_toy_assets import build_backbone_dir, build_tokenizer

    tmp = tmp_path_factory.mktemp("release")
    tokenizer, vocab_size = build_tokenizer(tmp / "backbone")
    build_backbone_dir(tmp / "backbone", vocab_size)

    from open_provence_tpu.encoder import OpenProvenceEncoder

    encoder = OpenProvenceEncoder(
        tmp / "backbone", tokenizer=tokenizer, max_length=64,
        attention_impl="xla", bucket_step=16,
    )
    ckpt = tmp / "ckpt"
    encoder.save_pretrained(ckpt)
    return ckpt


@pytest.mark.slow
def test_standalone_bundle_portable(exported_checkpoint, tmp_path):
    from open_provence_tpu.utils.modeling_export import write_standalone_bundle

    # Copy the checkpoint away from the repo and vendor the bundle into it.
    portable = tmp_path / "portable_ckpt"
    shutil.copytree(exported_checkpoint, portable)
    shim = write_standalone_bundle(portable)
    assert shim.exists()
    assert (portable / "open_provence_tpu" / "inference" / "engine.py").exists()
    assert not (portable / "open_provence_tpu" / "train" / "trainer.py").exists()

    # Load + process() in a subprocess whose cwd is the checkpoint and whose
    # sys.path does NOT include the repo — the portability property.
    script = (
        "import sys, json\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import modeling_open_provence_tpu as m\n"
        "model = m.OpenProvenceModel.from_pretrained('.')\n"
        "result = model.process('what about sushi ?', 'sushi is a dish . budget is boring .',"
        " threshold=0.0, show_progress=False)\n"
        "print(json.dumps({'pruned': result['pruned_context']}))\n"
    )
    result = subprocess.run(
        [sys.executable, "-c", script],
        cwd=portable,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr
    payload = json.loads(result.stdout.strip().splitlines()[-1])
    assert payload["pruned"] == "sushi is a dish . budget is boring ."


@pytest.mark.slow
def test_process_check_cli(exported_checkpoint):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "hf_check", REPO_ROOT / "scripts" / "hf_utils" / "hf_model_process_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--model", str(exported_checkpoint)])
    assert rc == 0


def test_sync_output_modeling(exported_checkpoint, tmp_path):
    import importlib.util

    # Stage a fake output tree with a deprecated config key.
    out_root = tmp_path / "output" / "run1"
    shutil.copytree(exported_checkpoint, out_root)
    config = json.loads((out_root / "config.json").read_text())
    config["splitter_default_language"] = "ja"
    (out_root / "config.json").write_text(json.dumps(config))

    spec = importlib.util.spec_from_file_location(
        "sync_mod", REPO_ROOT / "scripts" / "utils" / "sync_output_modeling.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main(["--root", str(tmp_path / "output")])
    assert rc == 0
    synced = json.loads((out_root / "config.json").read_text())
    assert "splitter_default_language" not in synced
    assert (out_root / "modeling_open_provence_tpu.py").exists()


def test_update_standalone_local(exported_checkpoint, tmp_path):
    import importlib.util

    local = tmp_path / "local_repo"
    shutil.copytree(exported_checkpoint, local)
    spec = importlib.util.spec_from_file_location(
        "upd", REPO_ROOT / "scripts" / "hf_utils" / "update_standalone.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main([str(local)])
    assert rc == 0
    assert (local / "modeling_open_provence_tpu.py").exists()


def test_golden_parity_mechanism(exported_checkpoint):
    """scripts/golden_parity.py end to end against the tiny fixture: the
    expectations are taken from the fixture's own output, so this tests the
    mechanism (load → quickstart → tolerance check → exit code), not the
    published golden numbers (which need the real checkpoint + network)."""
    sys.path.insert(0, str(REPO_ROOT / "scripts"))
    import golden_parity

    from make_toy_assets import build_tokenizer

    tok, _ = build_tokenizer(exported_checkpoint.parent / "backbone")
    result = golden_parity.run_quickstart(
        str(exported_checkpoint), tokenizer=tok, show_progress=False
    )
    assert set(result) >= {"pruned_context", "reranking_score", "compression_rate"}

    score = round(float(result["reranking_score"]), 4)
    compression = round(float(result["compression_rate"]), 2)
    assert golden_parity.check_result(
        result, expect_score=score, expect_compression=compression
    ) == []
    failures = golden_parity.check_result(
        result, expect_score=score + 1.0, expect_compression=compression
    )
    assert len(failures) == 1 and "reranking_score" in failures[0]
