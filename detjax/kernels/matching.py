"""Pallas TPU kernel: fused anchor↔GT IoU + argmax matching.

The XLA path materializes (or multi-pass streams) a [B, A, G] IoU tensor —
at the flagship shape (16 × 76 725 × 100) that's ~0.5 GB of intermediate
traffic per step just to produce two [B, A] vectors (best-IoU and best-GT).
This kernel tiles anchors into VMEM, keeps each [TILE, G] IoU block
register/VMEM-resident, and reduces it to (max, argmax) in place — the big
tensor never exists.

Matching semantics are identical to detjax.ops.matching._match_single:
invalid (padded) GTs get IoU −1; argmax ties break to the LOWEST GT index
(jnp.argmax convention). Oracle: the lax implementation; tests diff exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _match_kernel(apack_ref, gpack_ref, iou_ref, idx_ref, *,
                  tile: int, g_pad: int):
    """One (batch, anchor-tile) program.

    apack rows: ax1, ay1, ax2, ay2 over [8, tile] lanes.
    gpack rows: gx1, gy1, gx2, gy2, valid over [1, 8, g_pad].
    Outputs: iou_ref [1, 1(8), tile] max-IoU, idx_ref argmax (int32).
    """
    # anchor coords as [tile, 1] columns
    ax1 = jnp.swapaxes(apack_ref[0:1, :], 0, 1)
    ay1 = jnp.swapaxes(apack_ref[1:2, :], 0, 1)
    ax2 = jnp.swapaxes(apack_ref[2:3, :], 0, 1)
    ay2 = jnp.swapaxes(apack_ref[3:4, :], 0, 1)
    a_area = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    # gt coords as [1, g_pad] rows
    gx1 = gpack_ref[0, 0:1, :]
    gy1 = gpack_ref[0, 1:2, :]
    gx2 = gpack_ref[0, 2:3, :]
    gy2 = gpack_ref[0, 3:4, :]
    gvalid = gpack_ref[0, 4:5, :] > 0.5
    g_area = jnp.maximum(gx2 - gx1, 0.0) * jnp.maximum(gy2 - gy1, 0.0)

    # [tile, g_pad] block, VMEM-resident only
    iw = jnp.maximum(jnp.minimum(ax2, gx2) - jnp.maximum(ax1, gx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, gy2) - jnp.maximum(ay1, gy1), 0.0)
    inter = iw * ih
    union = jnp.maximum(a_area + g_area - inter, 1e-8)
    iou = jnp.where(gvalid, inter / union, -1.0)

    best = jnp.max(iou, axis=1)  # [tile]
    arg = jnp.argmax(iou, axis=1).astype(jnp.int32)  # [tile]
    iou_ref[0, 0:1, :] = best[None, :]
    idx_ref[0, 0:1, :] = arg[None, :]


def match_iou_pallas(
    anchors: Array,  # [A, 4] xyxy (trace-time constant)
    gt_boxes: Array,  # [B, G, 4]
    gt_valid: Array,  # [B, G] bool
    tile: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Returns (max_iou [B, A] f32, argmax_gt [B, A] i32) without ever
    materializing [B, A, G]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from detjax.kernels.postprocess import pallas_available

    if interpret is None:
        interpret = not pallas_available()
    a = anchors.shape[0]
    b, g = gt_valid.shape
    a_pad = _round_up(a, tile)
    g_pad = _round_up(max(g, _LANE), _LANE)

    apack = jnp.transpose(anchors.astype(jnp.float32), (1, 0))  # [4, A]
    apack = jnp.pad(apack, ((0, 4), (0, a_pad - a)))  # [8, Ap]
    gpack = jnp.concatenate([
        jnp.transpose(gt_boxes.astype(jnp.float32), (0, 2, 1)),  # [B,4,G]
        gt_valid.astype(jnp.float32)[:, None, :],  # [B,1,G]
        jnp.zeros((b, 3, g), jnp.float32),
    ], axis=1)
    gpack = jnp.pad(gpack, ((0, 0), (0, 0), (0, g_pad - g)))

    kernel = functools.partial(_match_kernel, tile=tile, g_pad=g_pad)
    iou, idx = pl.pallas_call(
        kernel,
        grid=(b, a_pad // tile),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, g_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, a_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, a_pad), jnp.int32),
        ],
        interpret=interpret,
    )(apack, gpack)
    return iou[:, 0, :a], idx[:, 0, :a]
