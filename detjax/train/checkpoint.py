"""Orbax checkpointing (SURVEY.md §5.3/§5.4).

The reference saves a whole-module pickle per epoch (``torch.save(model,
...)``) and loses optimizer state on resume. Here the ENTIRE training state
— params, batch_stats, opt_state, step — is one PyTree saved via Orbax
(async, atomic, retention-managed), so resume-after-preemption continues
bit-exactly: same optimizer moments, same step counter, same LR controller
input stream.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from detjax.train.step import TrainState


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True),
    )


class Checkpointer:
    """Save/restore TrainState PyTrees keyed by step."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, state: TrainState, wait: bool = False):
        import orbax.checkpoint as ocp

        step = int(np.asarray(state.step))
        tree = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats, "opt_state": state.opt_state}
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state`` (template for dtypes/shapes)."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {"step": state.step, "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state}
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype") else x, template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"], opt_state=restored["opt_state"])

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
