"""Training runtime: optimizer, schedules, train state/steps, early stopping."""

from cinema_tpu.train.optim import (
    EarlyStopping,
    build_optimizer,
    warmup_cosine_schedule,
)
from cinema_tpu.train.state import TrainState, make_train_state, make_mae_train_step

__all__ = [
    "EarlyStopping",
    "build_optimizer",
    "warmup_cosine_schedule",
    "TrainState",
    "make_train_state",
    "make_mae_train_step",
]
