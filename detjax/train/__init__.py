"""Training: jitted step, optimizer, loop, checkpointing (SURVEY.md §2 #16)."""

from detjax.train.step import (
    TrainState,
    get_learning_rate,
    make_train_state,
    make_train_step,
    set_learning_rate,
    train_step,
)
from detjax.train.loop import FitResult, ReduceLROnPlateau, fit

__all__ = [
    "TrainState",
    "make_train_state",
    "make_train_step",
    "train_step",
    "get_learning_rate",
    "set_learning_rate",
    "fit",
    "FitResult",
    "ReduceLROnPlateau",
]
