"""Distribution: jax.sharding mesh + pjit data-parallel (SURVEY.md §2b, §5.8).

The reference's multi-GPU story is ``torch.nn.DataParallel`` (single-process
CUDA scatter/gather; NCCL only under DDP). The TPU-native equivalent is a
deletion of that subsystem: one ``Mesh(('data',))`` over the v5e slice,
params replicated, batch sharded on 'data', and XLA emits the gradient
all-reduce over ICI inside the same compiled step. No backend code, no
launcher, identical program on 1 chip and v5e-8.

``make_mesh(spatial=k)`` upgrades this to a 2-D ``(data, space)`` mesh
with image rows sharded over 'space' — GSPMD spatial partitioning of the
conv stack (halo exchanges over ICI) for canvases too large for one
chip's HBM/step budget. TP/PP/EP remain deliberate deletions (no axis to
shard in a single-stage CNN detector; SURVEY.md §2b).
"""

from detjax.parallel.mesh import (
    global_batch_from_local,
    make_mesh,
    replicate,
    shard_batch,
    make_parallel_train_step,
    parallel_train_state,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "global_batch_from_local",
    "make_parallel_train_step",
    "parallel_train_state",
]
