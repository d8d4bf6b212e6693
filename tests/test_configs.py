"""All shipped YAML configs must parse into the argument dataclasses and
eval configs."""

import glob
from pathlib import Path

import pytest

from open_provence_tpu.eval.datasets_eval import EvalConfig
from open_provence_tpu.train.config import parse_config_file

REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize(
    "path", sorted(glob.glob(str(REPO_ROOT / "configs" / "*.yaml")))
)
def test_training_configs_parse(path):
    model_args, data_args, training_args = parse_config_file(path)
    assert model_args.model_name_or_path
    assert training_args.learning_rate > 0
    assert training_args.ranking_weight == 0.05
    assert training_args.pruning_weight == 1.0
    if data_args.datasets:
        for spec in data_args.datasets:
            assert "dataset_name" in spec
            assert "teacher_column" in spec


@pytest.mark.parametrize(
    "path", sorted(glob.glob(str(REPO_ROOT / "configs" / "eval_datasets" / "*.yaml")))
)
def test_eval_configs_parse(path):
    config = EvalConfig.load(path)
    assert config.datasets
    # The offline toy suite evaluates the local dataset's validation split;
    # every hub-dataset suite uses test (reference configs).
    assert config.split == ("validation" if "toy" in path else "test")
    if "nano" in path:
        assert all(spec.n_samples == 100 for spec in config.datasets)
