"""Mesh construction and sharded train step (benchmark config 5).

Layout decisions (scaling-book recipe: pick a mesh, annotate shardings, let
XLA insert collectives):
  * mesh axes: ``('data',)`` — pure DP; the model (~38M params fp32 +
    opt state ≈ 0.5 GB) fits trivially per chip, so TP/PP would only add
    ICI latency (SURVEY.md §2b: do not invent them).
  * params/opt_state: replicated ``P()``.
  * batch: ``P('data')`` on the leading dim; per-host feed shards land
    directly on their chips, gradient psum rides ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from detjax.config import Config
from detjax.train.step import TrainState, make_train_step


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Shard the leading (batch) dim of every array across the mesh."""
    s = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, s)


def global_batch_from_local(batch: Dict[str, Any], mesh: Mesh,
                            axis_name: str = "data"):
    """Assemble a GLOBAL batch from this process's local shard (multi-host
    DP): each host feeds only its per-host slice (see
    ``make_train_iterator(per_host=True)``); the returned arrays are
    globally sharded on ``axis_name`` with zero cross-host copies."""
    s = NamedSharding(mesh, P(axis_name))
    return {k: jax.make_array_from_process_local_data(s, np.asarray(v))
            for k, v in batch.items()}


def parallel_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate an existing host/state onto the mesh."""
    return replicate(state, mesh)


def make_parallel_train_step(cfg: Config, mesh: Mesh, axis_name: str = "data"):
    """pjit'd train step: state replicated, batch sharded on ``axis_name``.

    XLA partitions the forward/backward over the batch and inserts the
    gradient all-reduce over ICI — the reference's NCCL/DataParallel role
    is fully absorbed by the compiler (SURVEY.md §5.8).
    """
    base = make_train_step(cfg)  # jit-cached; sharding propagates from inputs
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def _place(state: TrainState, batch):
        batch = jax.device_put(batch, data)
        if jax.tree.leaves(state.params)[0].sharding != repl:
            state = jax.device_put(state, repl)
        return state, batch

    def run(state: TrainState, batch):
        state, batch = _place(state, batch)
        return base(state, batch)

    def warmup(state: TrainState, batch):
        """AOT compile without executing — multi-process callers compile
        BEFORE their first collective so the cross-host transport (Gloo on
        CPU meshes) connects without compile-time skew."""
        state, batch = _place(state, batch)
        base.lower(state, batch).compile()

    run.warmup = warmup
    return run
