"""Training utilities for MoP models (reference ``mop/training/__init__.py``)."""

from .trainer import Trainer, train_model
from .utils import (
    AverageMeter,
    EarlyStopping,
    cosine_lr,
    count_params,
    ema_update,
    format_time,
    load_checkpoint,
    print_model_info,
    save_checkpoint,
    set_seed,
)

__all__ = [
    "Trainer",
    "train_model",
    "cosine_lr",
    "set_seed",
    "count_params",
    "AverageMeter",
    "EarlyStopping",
    "ema_update",
    "format_time",
    "save_checkpoint",
    "load_checkpoint",
    "print_model_info",
]
