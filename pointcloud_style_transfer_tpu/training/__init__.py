from .ema import ema_init, ema_update
from .lr_schedule import lr_for_epoch, lr_scale_for_epoch
from .trainer import (DiffusionTrainer, compute_losses, make_eval_step,
                      make_eval_step_fn, make_optimizer, make_train_step,
                      make_train_step_fn)

__all__ = [
    "ema_init", "ema_update", "lr_for_epoch", "lr_scale_for_epoch",
    "DiffusionTrainer", "compute_losses", "make_eval_step", "make_eval_step_fn",
    "make_optimizer", "make_train_step", "make_train_step_fn",
]
