"""Batch-SPMD partitioning rules for the Pallas kernels.

A ``pallas_call`` lowers to an opaque custom call, which the SPMD
partitioner (GSPMD/Shardy) cannot partition: under pjit with a sharded
batch the partitioner *replicates* the region — every chip all-gathers the
global batch and runs the full kernel (measured on the 8-device CPU mesh:
output sharding collapses to replicated). That silently forfeits the
data-parallel speedup of exactly the ops we hand-wrote kernels for.

:func:`batch_spmd_call` wraps a kernel invocation in
``jax.experimental.custom_partitioning`` with a rule that declares the
ONE safe parallel axis — the leading batch dim of the batched operands and
of every result — and requires replication of all other dims (anchor
packs, lane/sublane layout axes). Under pjit each shard then runs the
kernel on its local batch; with no mesh in scope the wrapper is inert.

The wrapper is applied only in multi-device processes (``_multi_device``)
so the single-chip serving/train path lowers byte-identically to before.

SURVEY.md §2 #7/#12 (matching, NMS) — the kernels this protects.
"""

from __future__ import annotations

import string
from typing import Callable, Sequence

import jax


def _multi_device() -> bool:
    """Partitioning can only matter when >1 device is visible."""
    return len(jax.devices()) > 1 or jax.process_count() > 1


def _batch_axes(sharding):
    """The mesh-axis (or axes) a NamedSharding assigns to dim 0, else None."""
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) == 0:
        return None
    return spec[0]


# Process-lifetime memo of custom_partitioning wrappers, keyed by
# (site key, batched flags, operand shapes/dtypes). A custom_partitioning
# object registers Python callbacks whose POINTER is baked into the
# compilation-cache key and the lowered custom call; building a fresh one
# per invocation lets it be GC'd after the trace, and a later allocation
# can land on the recycled address — the persistent compile cache then
# HITS the stale entry and deserializes an executable referencing the
# dead callback (observed as a deterministic segfault in
# jax compilation_cache.get_executable_and_time when the full test suite
# runs in one process). Keeping one wrapper alive per call signature makes
# the pointers stable for the process lifetime: same-process hits are
# valid, cross-process keys simply miss and recompile.
_CP_CACHE: dict = {}


def batch_spmd_call(fn: Callable, args: Sequence[jax.Array],
                    batched: Sequence[bool], key=None):
    """Run ``fn(*args)`` under a batch-dim-only SPMD partitioning rule.

    ``batched[i]`` marks operands whose dim 0 is the batch; every result of
    ``fn`` must carry the batch on dim 0. All non-batch dims are declared
    need-replication, so the partitioner all-gathers any stray sharding
    (e.g. an anchor axis inheriting 'space' from spatial partitioning)
    before the kernel and shards only over the batch.

    ``key`` is a hashable site identifier covering every non-operand value
    ``fn`` closes over (thresholds, tile sizes, interpret flag, ...): the
    wrapper is memoized per (key, batched, operand shapes/dtypes) and the
    FIRST ``fn`` seen for a signature is reused for all later calls — see
    ``_CP_CACHE``. Passing ``key=None`` disables memoization (safe, but
    reintroduces the GC'd-callback cache hazard under a persistent
    compilation cache).
    """
    if not _multi_device():
        return fn(*args)

    memo_key = None
    if key is not None:
        memo_key = (key, tuple(batched),
                    tuple((a.shape, str(a.dtype)) for a in args))
        cp = _CP_CACHE.get(memo_key)
        if cp is not None:
            return cp(*args)

    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    out_tree = jax.eval_shape(fn, *args)
    out_leaves = jax.tree.leaves(out_tree)

    # einsum-like Shardy rule: shared factor 'b' on every batched dim 0,
    # a unique need-replication factor for every other dim.
    fresh = iter(f"{c}{i}" for i in range(64) for c in string.ascii_lowercase
                 if c != "b")
    repl = []

    def dims(shape, is_batched):
        out = []
        for d in range(len(shape)):
            if d == 0 and is_batched:
                out.append("b")
            else:
                f = next(fresh)
                repl.append(f)
                out.append(f)
        return " ".join(out)

    in_rule = ", ".join(dims(a.shape, ib) for a, ib in zip(args, batched))
    out_rule = ", ".join(dims(o.shape, True) for o in out_leaves)
    rule = f"{in_rule} -> {out_rule}"

    def _sanitize(shardings_in, batched_flags, mesh):
        """Keep only the dim-0 axes of each incoming sharding."""
        out = []
        for s, ib in zip(shardings_in, batched_flags):
            ax = _batch_axes(s) if ib else None
            out.append(NamedSharding(mesh, P(ax) if ax is not None else P()))
        return out

    def partition(mesh, arg_shapes, result_shape):
        res_leaves, res_tree = jax.tree.flatten(result_shape)
        arg_sh = _sanitize([a.sharding for a in arg_shapes], batched, mesh)
        # results follow whichever batch axes the operands carry
        b_ax = next((_batch_axes(s) for s in arg_sh
                     if _batch_axes(s) is not None), None)
        res_sh = jax.tree.unflatten(res_tree, [
            NamedSharding(mesh, P(b_ax) if b_ax is not None else P())
            for _ in res_leaves])

        def lower_fn(*local_args):
            return fn(*local_args)

        return mesh, lower_fn, res_sh, tuple(arg_sh)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        # legacy GSPMD path (shardy off): same dim-0 rule
        b_ax = next((_batch_axes(a.sharding)
                     for a, ib in zip(arg_shapes, batched)
                     if ib and _batch_axes(a.sharding) is not None), None)
        res_leaves, res_tree = jax.tree.flatten(result_shape)
        return jax.tree.unflatten(res_tree, [
            NamedSharding(mesh, P(b_ax) if b_ax is not None else P())
            for _ in res_leaves])

    cp = custom_partitioning(fn)
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=tuple(repl),
    )
    if memo_key is not None:
        _CP_CACHE[memo_key] = cp
    return cp(*args)
