"""Training layer: losses, schedules, trainers, checkpointing."""

from .checkpoint import build_model_from_meta, load_checkpoint, save_checkpoint
from .loss import dual_gnn_loss, greedy_primal_upper, masked_v_proj, one_gnn_loss
from .schedule import make_optimizer, warmup_cosine
from .trainer import BucketBatcher, State, TrainConfig, train_one_gnn

__all__ = [
    "build_model_from_meta",
    "load_checkpoint",
    "save_checkpoint",
    "dual_gnn_loss",
    "greedy_primal_upper",
    "masked_v_proj",
    "one_gnn_loss",
    "make_optimizer",
    "warmup_cosine",
    "BucketBatcher",
    "State",
    "TrainConfig",
    "train_one_gnn",
]
