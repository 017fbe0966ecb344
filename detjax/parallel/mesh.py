"""Mesh construction and sharded train step (benchmark config 5).

Layout decisions (scaling-book recipe: pick a mesh, annotate shardings, let
XLA insert collectives):
  * mesh axes: ``('data',)`` — pure DP; the model (~38M params fp32 +
    opt state ≈ 0.5 GB) fits trivially per chip, so TP/PP would only add
    ICI latency (SURVEY.md §2b: do not invent them).
  * params/opt_state: replicated ``P()``.
  * batch: ``P('data')`` on the leading dim; per-host feed shards land
    directly on their chips, gradient psum rides ICI.

Spatial partitioning (``spatial > 1``): the one *model*-sharding axis that
IS idiomatic for a single-stage CNN detector on TPU. The mesh becomes 2-D
``('data', 'space')`` and images are sharded ``P('data', 'space')`` — each
image's ROWS are split across the 'space' group, so the conv stack runs
spatially partitioned with the partitioner (Shardy, jax's default)
inserting halo exchanges (collective permutes of boundary rows) over ICI.
Pyramid levels too small to row-shard gather at the FPN output boundary
(detjax/models/spatial.py layout rule); anchor-space ops (flatten →
matching → loss) reshard to ``P('data')`` (one all-gather per step — the
classic TPU detection spatial-partitioning design). Use when the canvas
is too large for one chip's step time or HBM (e.g. the 1024-px eval
protocol, megapixel serving): it scales a FIXED batch to more chips than
DP alone allows (DP needs bs ≥ n_devices; DP×SP needs bs ≥
n_devices / spatial).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from detjax.config import Config
from detjax.train.step import TrainState, make_train_step


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis_name: str = "data", spatial: int = 1) -> Mesh:
    """1-D DP mesh, or a 2-D ``(data, space)`` mesh when ``spatial > 1``.

    ``spatial`` must divide the device count; adjacent devices are grouped
    into the 'space' axis so halo exchanges ride nearest-neighbour ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    if spatial <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % spatial:
        raise ValueError(
            f"spatial={spatial} does not divide {len(devices)} devices")
    grid = np.asarray(devices).reshape(-1, spatial)
    return Mesh(grid, (axis_name, "space"))


def _image_spec(mesh: Mesh, axis_name: str = "data") -> P:
    """Batch-images PartitionSpec: rows sharded too on a 2-D mesh."""
    if "space" in mesh.axis_names:
        return P(axis_name, "space")
    return P(axis_name)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis_name: str = "data"):
    """Shard the leading (batch) dim of every array across the mesh; on a
    2-D ``(data, space)`` mesh, image rows are additionally sharded over
    'space' (spatial partitioning of the conv stack)."""
    data = NamedSharding(mesh, P(axis_name))
    img = NamedSharding(mesh, _image_spec(mesh, axis_name))
    return {k: jax.device_put(v, img if k == "images" else data)
            for k, v in batch.items()}


def global_batch_from_local(batch: Dict[str, Any], mesh: Mesh,
                            axis_name: str = "data"):
    """Assemble a GLOBAL batch from this process's local shard (multi-host
    DP): each host feeds only its per-host slice (see
    ``make_train_iterator(per_host=True)``); the returned arrays are
    globally sharded on ``axis_name`` with zero cross-host copies. On a
    2-D ``(data, space)`` mesh images additionally shard rows over
    'space'; each process still feeds the same contiguous per-host batch
    slice (the space axis subdivides rows *within* each data group)."""
    data = NamedSharding(mesh, P(axis_name))
    img = NamedSharding(mesh, _image_spec(mesh, axis_name))
    return {k: jax.make_array_from_process_local_data(
                img if k == "images" else data, np.asarray(v))
            for k, v in batch.items()}


def _shardy_toggle():
    """The jax config context that selects the partitioner, or None when
    legacy GSPMD propagation is no longer toggleable (future jax). Used
    ONLY by tests/test_parallel.py to pin Shardy-vs-GSPMD loss equality
    across the partitioner migration; production compiles run the jax
    default (Shardy) everywhere."""
    try:
        from jax._src.config import use_shardy_partitioner
        return use_shardy_partitioner
    except ImportError:
        return None


def _mesh_context(mesh: Mesh):
    """Compile context for ``mesh``: installs the ABSTRACT mesh so the
    model's spatial layout rule (detjax/models/spatial.py
    ``unshard_tiny_levels``) can see the 'space' axis at trace time and
    place the FPN gather boundary when pyramid levels are too small to
    row-shard — the change that makes jax 0.9.0's default Shardy
    partitioner compile the DP×SP step CORRECTLY (it miscompiled the
    degenerate-level repartition, xla b/433785288; the round-4 legacy
    GSPMD pin is retired — see spatial.py for the measurements and
    tests/test_parallel.py::test_spatial_shardy_matches_gspmd for the
    equality pin). The context is jit-key-aware: DP-only and spatial
    compiles never share a trace."""
    if "space" not in mesh.axis_names:
        return contextlib.nullcontext
    return lambda: jax.sharding.use_abstract_mesh(mesh.abstract_mesh)


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
    img = NamedSharding(mesh, _image_spec(mesh, axis_name))
    partitioner = _mesh_context(mesh)

    def _place(state: TrainState, batch):
        batch = {k: jax.device_put(v, img if k == "images" else data)
                 for k, v in batch.items()}
        if jax.tree.leaves(state.params)[0].sharding != repl:
            state = jax.device_put(state, repl)
        return state, batch

    def run(state: TrainState, batch):
        state, batch = _place(state, batch)
        with partitioner():
            return base(state, batch)

    def warmup(state: TrainState, batch):
        """AOT compile without executing — multi-process callers compile
        BEFORE their first collective so the cross-host transport (Gloo on
        CPU meshes) connects without compile-time skew."""
        state, batch = _place(state, batch)
        with partitioner():
            base.lower(state, batch).compile()

    run.warmup = warmup
    return run
