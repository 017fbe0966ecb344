"""Orbax checkpointing (SURVEY.md §5.3/§5.4).

The reference saves a whole-module pickle per epoch (``torch.save(model,
...)``) and loses optimizer state on resume. Here the ENTIRE training state
— params, batch_stats, opt_state, step as one Orbax PyTree item, plus a
separate JSON ``host`` item for host-side controller state
(ReduceLROnPlateau best/num_bad, loss window) — is saved via Orbax (async,
atomic, retention-managed). Keeping ``host`` a separate Composite item
means device-state-only consumers (detect/eval/export CLIs) restore with a
host-free template no matter which writer produced the step. Resume is
bit-exact end-to-end: same optimizer moments, same step counter, same LR
controller state, and the data stream continues at the same global batch
(``DetectionIterator.iter_from`` seeks by step; see
``tests/test_train_loop.py`` resume-equivalence test).
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

    def save(self, state: TrainState, wait: bool = False,
             host: Optional[dict] = None):
        """``host``: flat dict of host-side scalars (floats/ints) saved
        alongside the device state (e.g. LR-plateau controller state).

        Saved as a SEPARATE Composite item (JSON), not inside the state
        PyTree — so consumers that only want the device state (detect/eval/
        export CLIs) restore it with a host-free template regardless of
        whether the writer tracked host state."""
        import orbax.checkpoint as ocp

        step = int(np.asarray(state.step))
        tree = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats, "opt_state": state.opt_state}
        if state.ema_params is not None:  # EMA shadow (train.ema_decay > 0)
            tree["ema_params"] = state.ema_params
        items = {"state": ocp.args.StandardSave(tree)}
        if host:
            items["host"] = ocp.args.JsonSave(
                {k: (v.item() if hasattr(v, "item") else v)
                 for k, v in host.items()})
        self._mgr.save(step, args=ocp.args.Composite(**items))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def _has_item(self, step: int, item: str) -> bool:
        """True when the Composite layout's ``item`` directory exists for
        ``step`` — the explicit layout probe that decides Composite vs
        legacy restore (a genuine restore error, e.g. a template shape
        mismatch from the wrong --preset, must NOT be misread as 'legacy
        layout' and swallowed)."""
        return os.path.isdir(os.path.join(
            os.path.abspath(self.directory), str(step), item))

    def restore(self, state: TrainState, step: Optional[int] = None,
                host_template: Optional[dict] = None):
        """Restore into the structure of ``state`` (template for dtypes/shapes).

        With ``host_template`` (a dict shaped like the ``host`` arg of
        ``save``), returns ``(state, host)``; ``host`` falls back to the
        template values when the checkpoint predates host-state saving.
        """
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        template = {"step": state.step, "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state}
        if state.ema_params is not None:
            # EMA-enabled template: the checkpoint must carry the shadow
            # tree (restoring a pre-EMA checkpoint with ema_decay>0 is a
            # structure mismatch by design — start EMA from a fresh state)
            template["ema_params"] = state.ema_params
        want_host = host_template is not None

        def _abstract(x):
            if not hasattr(x, "dtype"):
                return x
            # carry the template's sharding: multi-process restore (the
            # v5e-8 multihost path) must know the global placement, and a
            # sharded template also restores replicated/sharded state
            # directly onto the mesh instead of host-staging it
            sharding = getattr(x, "sharding", None)
            if isinstance(x, jax.Array) and sharding is not None:
                return jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                            sharding=sharding)
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)

        abstract = jax.tree.map(_abstract, template)
        if self._has_item(step, "state"):
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract)))["state"]
        else:
            # legacy layout (pre-Composite): one 'default' item holding the
            # state tree, possibly with an inline 'host' subtree
            restored = self._restore_legacy(step, abstract, host_template)
        new_state = state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"], opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params", state.ema_params))
        if not want_host:
            return new_state
        host = dict(host_template)
        if self._has_item(step, "host"):
            saved = self._mgr.restore(
                step, args=ocp.args.Composite(host=ocp.args.JsonRestore()))
            host.update(saved["host"])
        else:
            # no JSON host item: legacy inline subtree or no host at all
            host.update(getattr(self, "_legacy_host", None) or {})
        self._legacy_host = None
        return new_state, host

    def _restore_legacy(self, step, abstract, host_template):
        """Read a pre-Composite checkpoint ('default' item = state tree,
        host scalars inline under 'host'). Sets ``_legacy_host`` for the
        host-template path."""
        import orbax.checkpoint as ocp

        self._legacy_host = None
        if host_template is not None:
            with_host = dict(abstract)
            with_host["host"] = {
                k: jax.ShapeDtypeStruct(np.shape(np.asarray(v)),
                                        np.asarray(v).dtype)
                for k, v in host_template.items()}
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(with_host))
                self._legacy_host = {
                    k: v.item() if hasattr(v, "item") else v
                    for k, v in restored.pop("host").items()}
                return restored
            except Exception:
                pass  # legacy checkpoint without inline host state
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(abstract))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
