"""Training: jitted step, optimizer, loop, checkpointing (SURVEY.md §2 #16)."""

from detjax.train.step import TrainState, make_train_state, make_train_step, train_step

__all__ = ["TrainState", "make_train_state", "make_train_step", "train_step"]
