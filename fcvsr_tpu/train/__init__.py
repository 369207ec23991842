from .losses import (
    charbonnier,
    charbonnier_sum,
    l1_loss,
    mse_loss,
    sobel_loss,
    total_variation,
)
from .lr_schedule import cosine_restart, linear_decay, multistep
from .trainer import TrainState, create_train_state, make_eval_step, make_train_step

__all__ = [
    "charbonnier",
    "charbonnier_sum",
    "l1_loss",
    "mse_loss",
    "sobel_loss",
    "total_variation",
    "cosine_restart",
    "linear_decay",
    "multistep",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
