"""Spatial-partitioning layout rule for pyramid features (SURVEY.md §2b;
VERDICT r4 next #6 — the migration off deprecated GSPMD propagation).

Under the 2-D ``(data, space)`` mesh, image ROWS are sharded over 'space'
and the conv stack runs spatially partitioned (the large-canvas scale-out).
Deep pyramid levels shrink until some level has almost no rows per device
— P6/P7 of a small canvas are 2×2 and 1×1. Two facts, both measured on the
8-device CPU mesh (tests/test_parallel.py pins them):

  * With every level at ≥ 2 rows per 'space' shard, Shardy (jax 0.9.0's
    default partitioner) compiles the spatial train step CORRECTLY —
    no annotations needed beyond the input shardings.
  * The moment any level is smaller, the partitioner's repartition
    fallback on those degenerate tensors ("Involuntary full
    rematerialization", xla b/433785288) produces WRONG VALUES whenever
    the backward is live (loss 810.7 vs 21.8) — and a mixed layout
    (big levels row-sharded, tiny levels batch-only) still routes the
    row→batch reshard through the same broken path on a tiny tensor.

The rule encoded here follows directly: when any level would be
degenerate, move the whole gather boundary UP to the FPN outputs —
constrain EVERY pyramid level to batch-only sharding (``P('data')``), so
the backbone still scales over 'space' (where the large-canvas FLOPs and
activation memory live), the one reshard happens on healthy-size tensors,
and the FPN-extras/heads run batch-parallel. When no level is degenerate
(the real SP use-case: 1024-px canvases and up), nothing is constrained
and the full conv stack stays spatially partitioned, heads included.

No-op without an active mesh carrying a 'space' axis, so the model stays
mesh-agnostic: ``make_parallel_train_step`` (and the mesh-sharded eval
path) install the mesh via ``jax.sharding.use_abstract_mesh`` — a
jit-key-aware context, so DP-only and spatial compiles never share a
trace.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Array = jnp.ndarray

# A level is row-shardable when every 'space' shard gets at least this
# many whole rows (3×3 convs on a 1-row shard have no local work to
# parallelize, and jax 0.9.0 miscompiles the backward — see module doc).
MIN_ROWS_PER_SHARD = 2


def _space_axis_size() -> int:
    """Size of the active mesh's 'space' axis, or 0 when no spatial mesh
    is installed (trace-time constant)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or "space" not in mesh.axis_names:
        return 0
    return int(mesh.shape["space"])


def _degenerate(rows: int, n_sp: int) -> bool:
    return rows < MIN_ROWS_PER_SHARD * n_sp or rows % n_sp != 0


def unshard_tiny_levels(feats: Dict[int, Array]) -> Dict[int, Array]:
    """Apply the spatial layout rule across a feature pyramid: identity
    unless a spatial mesh is active AND some level is too small to
    row-shard — then ALL levels become batch-only sharded (the FPN-output
    gather boundary)."""
    n_sp = _space_axis_size()
    if n_sp == 0:
        return feats
    if not any(_degenerate(x.shape[1], n_sp) for x in feats.values()):
        return feats
    return {lvl: jax.lax.with_sharding_constraint(x, P("data"))
            for lvl, x in feats.items()}
