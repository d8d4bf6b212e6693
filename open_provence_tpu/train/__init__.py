from .collator import OpenProvenceDataCollator
from .config import (
    DataArguments,
    ModelArguments,
    PruningTrainingArguments,
    parse_config_file,
)
from .data import (
    batch_iterator,
    filter_pruning_dataset,
    prepare_dataset,
    sample_items_by_label_priority,
    upsample_dataset,
)
from .encoder_init import init_encoder
from .losses import joint_loss, pruning_loss, ranking_loss
from .runner import main, train
from .trainer import (
    OpenProvenceTrainer,
    calculate_dynamic_steps,
    make_optimizer,
    resolve_resume_checkpoint_path,
)

__all__ = [
    "OpenProvenceDataCollator",
    "DataArguments",
    "ModelArguments",
    "PruningTrainingArguments",
    "parse_config_file",
    "batch_iterator",
    "filter_pruning_dataset",
    "prepare_dataset",
    "sample_items_by_label_priority",
    "upsample_dataset",
    "init_encoder",
    "joint_loss",
    "pruning_loss",
    "ranking_loss",
    "main",
    "train",
    "OpenProvenceTrainer",
    "calculate_dynamic_steps",
    "make_optimizer",
    "resolve_resume_checkpoint_path",
]
