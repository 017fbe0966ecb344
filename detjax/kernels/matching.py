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


def _match_kernel(apack_ref, gpack_ref, out_ref, idx_ref, *,
                  tile: int, g_pad: int):
    """One (batch, anchor-tile) program.

    Layout: GT on SUBLANES, anchors on LANES — every reduction runs along
    the sublane axis and every output is lane-major, so Mosaic never needs
    a cross-axis relayout (an argmax over the lane axis fails to legalize).

    The kernel also extracts the MATCHED GT's box and label by masked
    reduction while everything is VMEM-resident: the XLA alternative —
    ``take_along_axis`` gathers over [B, A] — costs >10 ms/step at the
    flagship shape, more than the IoU computation itself.

    apack rows: ax1, ay1, ax2, ay2 over [8, tile].
    gpack: [1, g_pad, 8] — column c = (x1, y1, x2, y2, valid, label).
    Outputs: out_ref [1, 8, tile] rows = (max_iou, mx1, my1, mx2, my2,
    mlabel, 0, 0); idx_ref [1, 1, tile] argmax int32.
    """
    # anchor coords as [1, tile] lane rows
    ax1 = apack_ref[0:1, :]
    ay1 = apack_ref[1:2, :]
    ax2 = apack_ref[2:3, :]
    ay2 = apack_ref[3:4, :]
    a_area = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    # gt data as [g_pad, 1] sublane columns
    gx1 = gpack_ref[0, :, 0:1]
    gy1 = gpack_ref[0, :, 1:2]
    gx2 = gpack_ref[0, :, 2:3]
    gy2 = gpack_ref[0, :, 3:4]
    gvalid = gpack_ref[0, :, 4:5] > 0.5
    glabel = gpack_ref[0, :, 5:6]
    g_area = jnp.maximum(gx2 - gx1, 0.0) * jnp.maximum(gy2 - gy1, 0.0)

    # [g_pad, tile] block, VMEM-resident only
    iw = jnp.maximum(jnp.minimum(ax2, gx2) - jnp.maximum(ax1, gx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, gy2) - jnp.maximum(ay1, gy1), 0.0)
    inter = iw * ih
    union = jnp.maximum(a_area + g_area - inter, 1e-8)
    iou = jnp.where(gvalid, inter / union, -1.0)

    best = jnp.max(iou, axis=0, keepdims=True)  # [1, tile]
    rows = jax.lax.broadcasted_iota(jnp.int32, (g_pad, tile), 0)
    # lowest GT index among ties — jnp.argmax convention
    arg = jnp.min(jnp.where(iou == best, rows, g_pad), axis=0, keepdims=True)
    sel = rows == arg  # [g_pad, tile] one-hot of the winner

    def pick(col):  # [g_pad, 1] → [1, tile] winner's value
        return jnp.sum(jnp.where(sel, col, 0.0), axis=0, keepdims=True)

    zeros = jnp.zeros_like(best)
    out_ref[0] = jnp.concatenate(
        [best, pick(gx1), pick(gy1), pick(gx2), pick(gy2), pick(glabel),
         zeros, zeros], axis=0)
    idx_ref[0, 0:1, :] = arg.astype(jnp.int32)


def match_iou_pallas(
    anchors: Array,  # [A, 4] xyxy (trace-time constant)
    gt_boxes: Array,  # [B, G, 4]
    gt_valid: Array,  # [B, G] bool
    gt_labels: Optional[Array] = None,  # [B, G] int32 (-1 padding)
    tile: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Fused matching: returns (max_iou [B, A] f32, argmax_gt [B, A] i32,
    matched_boxes [B, A, 4] f32, matched_labels_raw [B, A] i32 — the label
    of the argmax GT regardless of thresholds) without ever materializing
    [B, A, G] or issuing gathers."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from detjax.kernels.postprocess import pallas_available

    if interpret is None:
        interpret = not pallas_available()
    a = anchors.shape[0]
    b, g = gt_valid.shape
    a_pad = _round_up(a, tile)
    g_pad = _round_up(max(g, 8), 8)  # GT lives on sublanes (f32 tile = 8)
    if gt_labels is None:
        gt_labels = jnp.zeros((b, g), jnp.int32)

    apack = jnp.transpose(anchors.astype(jnp.float32), (1, 0))  # [4, A]
    apack = jnp.pad(apack, ((0, 4), (0, a_pad - a)))  # [8, Ap]
    # [B, Gp, 8]: GT on sublanes, coord index on (tiny) lane axis
    gpack = jnp.concatenate([
        gt_boxes.astype(jnp.float32),  # [B, G, 4]
        gt_valid.astype(jnp.float32)[:, :, None],  # [B, G, 1]
        gt_labels.astype(jnp.float32)[:, :, None],  # [B, G, 1]
        jnp.zeros((b, g, 2), jnp.float32),
    ], axis=2)
    gpack = jnp.pad(gpack, ((0, 0), (0, g_pad - g), (0, 0)))

    kernel = functools.partial(_match_kernel, tile=tile, g_pad=g_pad)

    def _call(apack, gpack):
        bb = gpack.shape[0]  # local (per-shard) batch under pjit
        return pl.pallas_call(
            kernel,
            grid=(bb, a_pad // tile),
            in_specs=[
                pl.BlockSpec((8, tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_pad, 8), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bb, 8, a_pad), jnp.float32),
                jax.ShapeDtypeStruct((bb, 1, a_pad), jnp.int32),
            ],
            interpret=interpret,
        )(apack, gpack)

    # batch-SPMD rule: under pjit the kernel runs per-shard on the local
    # batch instead of being replicated (see kernels/spmd.py)
    from detjax.kernels.spmd import batch_spmd_call

    pack, idx = batch_spmd_call(_call, (apack, gpack), (False, True),
                                key=("match", tile, g_pad, interpret))
    max_iou = pack[:, 0, :a]
    matched_boxes = jnp.transpose(pack[:, 1:5, :a], (0, 2, 1))  # [B, A, 4]
    matched_labels_raw = pack[:, 5, :a].astype(jnp.int32)
    return max_iou, idx[:, 0, :a], matched_boxes, matched_labels_raw
