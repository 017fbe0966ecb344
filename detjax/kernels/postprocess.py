"""Pallas TPU kernels: box decode and class-aware greedy NMS.

These replace the reference's postprocessing natives (torchvision C++/CUDA
``nms``, torch CUDA elementwise decode — SURVEY.md §2a) with on-chip
kernels. Data layout is TRANSPOSED to hardware shape: coordinates live as
sublane ROWS over a lane axis of boxes ([8, N] packs: x1,y1,x2,y2,… rows),
so every step of the greedy loop is full-width VPU work with no gathers.

The greedy NMS loop is the one truly sequential part of detection
postprocessing; doing it in a single Pallas kernel keeps all candidates in
VMEM for the whole loop (vs. ~max_det separate HBM round-trips for a
fusion-unfriendly XLA scan) and uses masked reductions instead of dynamic
gathers for the "extract best box" step.

Correctness oracle: ``detjax.ops.nms`` lax implementations; tests diff
keep-sets element-for-element (kernels run in interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

NEG_INF = -1e10
_LANE = 128


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic compile path)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Greedy class-aware NMS kernel
# ---------------------------------------------------------------------------


def _nms_kernel(pack_ref, scores_ref, idx_ref, out_scores_ref, *,
                n_pad: int, md_pad: int, max_det: int, iou_threshold: float):
    """One image per grid program. pack rows: x1,y1,x2,y2,class-offset.

    The class offset row turns per-class NMS into ONE class-agnostic pass
    (torchvision ``batched_nms`` trick): different classes are translated to
    disjoint regions, so cross-class IoU is 0 and same-class IoU is
    unchanged (translation invariance).
    """
    off = pack_ref[0, 4:5, :]
    x1 = pack_ref[0, 0:1, :] + off  # [1, N]
    y1 = pack_ref[0, 1:2, :] + off
    x2 = pack_ref[0, 2:3, :] + off
    y2 = pack_ref[0, 3:4, :] + off
    areas = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    md_col = jax.lax.broadcasted_iota(jnp.int32, (1, md_pad), 1)

    def body(i, carry):
        live, kidx, kscr = carry
        best_score = jnp.max(live)
        # lowest index among ties — matches argmax/torchvision stable order
        best = jnp.min(jnp.where(live == best_score, col, n_pad))
        valid = best_score > NEG_INF / 2
        bmask = col == best
        # masked-reduce extraction: no dynamic lane gather needed
        bx1 = jnp.sum(jnp.where(bmask, x1, 0.0))
        by1 = jnp.sum(jnp.where(bmask, y1, 0.0))
        bx2 = jnp.sum(jnp.where(bmask, x2, 0.0))
        by2 = jnp.sum(jnp.where(bmask, y2, 0.0))
        barea = jnp.sum(jnp.where(bmask, areas, 0.0))
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(areas + barea - inter, 1e-8)
        suppress = (iou > iou_threshold) | bmask
        live = jnp.where(valid & suppress, NEG_INF, live)
        sel = (md_col == i) & valid
        kidx = jnp.where(sel, best, kidx)
        kscr = jnp.where(sel, best_score, kscr)
        return live, kidx, kscr

    live0 = scores_ref[0, 0:1, :]
    init = (live0,
            jnp.full((1, md_pad), -1, jnp.int32),
            jnp.zeros((1, md_pad), jnp.float32))
    _, kidx, kscr = jax.lax.fori_loop(0, max_det, body, init)
    idx_ref[0, 0:1, :] = kidx
    out_scores_ref[0, 0:1, :] = kscr


def nms_pallas(
    boxes: Array,  # [B, N, 4] xyxy (real, un-offset coordinates)
    scores: Array,  # [B, N]; entries <= NEG_INF/2 pre-suppressed
    labels: Array,  # [B, N] int32 class per candidate
    iou_threshold: float = 0.5,
    max_det: int = 100,
    class_offset: float = 1e4,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Batched class-aware greedy NMS on TPU.

    Returns ``(keep_idx [B, max_det] int32 into N (-1 pad),
    keep_scores [B, max_det] f32)``. Keep order is descending score, ties by
    lower index — torchvision-compatible.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not pallas_available()
    b, n = scores.shape
    n_pad = _round_up(max(n, _LANE), _LANE)
    md_pad = _round_up(max(max_det, _LANE), _LANE)

    # pack [B, 8, Np]: rows x1,y1,x2,y2,offset,0,0,0
    bt = jnp.transpose(boxes.astype(jnp.float32), (0, 2, 1))  # [B, 4, N]
    offs = labels.astype(jnp.float32)[:, None, :] * class_offset  # [B,1,N]
    pack = jnp.concatenate(
        [bt, offs, jnp.zeros((b, 3, n), jnp.float32)], axis=1)
    pack = jnp.pad(pack, ((0, 0), (0, 0), (0, n_pad - n)))
    scr = jnp.full((b, 1, n_pad), NEG_INF, jnp.float32)
    scr = scr.at[:, 0, :n].set(scores.astype(jnp.float32))
    # SMEM-friendly 8-sublane padding for the scores block as well
    scr = jnp.pad(scr, ((0, 0), (0, 7), (0, 0)), constant_values=NEG_INF)

    kernel = functools.partial(
        _nms_kernel, n_pad=n_pad, md_pad=md_pad, max_det=max_det,
        iou_threshold=float(iou_threshold))

    def _call(pack, scr):
        bb = scr.shape[0]  # local (per-shard) batch under pjit
        return pl.pallas_call(
            kernel,
            grid=(bb,),
            in_specs=[
                pl.BlockSpec((1, 8, n_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, n_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, md_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, md_pad), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bb, 1, md_pad), jnp.int32),
                jax.ShapeDtypeStruct((bb, 1, md_pad), jnp.float32),
            ],
            interpret=interpret,
        )(pack, scr)

    # batch-SPMD rule: per-shard NMS under pjit (see kernels/spmd.py)
    from detjax.kernels.spmd import batch_spmd_call

    idx, kscr = batch_spmd_call(
        _call, (pack, scr), (True, True),
        key=("nms", n_pad, md_pad, max_det, float(iou_threshold),
             interpret))
    return idx[:, 0, :max_det], kscr[:, 0, :max_det]


# ---------------------------------------------------------------------------
# Box decode (+clip) kernel
# ---------------------------------------------------------------------------


def _decode_kernel(deltas_ref, anchors_ref, out_ref, *,
                   std: Tuple[float, float, float, float],
                   image_size: Optional[Tuple[int, int]]):
    dx = deltas_ref[0, 0:1, :] * std[0]
    dy = deltas_ref[0, 1:2, :] * std[1]
    dw = deltas_ref[0, 2:3, :] * std[2]
    dh = deltas_ref[0, 3:4, :] * std[3]
    ax1 = anchors_ref[0:1, :]
    ay1 = anchors_ref[1:2, :]
    ax2 = anchors_ref[2:3, :]
    ay2 = anchors_ref[3:4, :]
    aw = ax2 - ax1
    ah = ay2 - ay1
    acx = ax1 + 0.5 * aw
    acy = ay1 + 0.5 * ah
    px = dx * aw + acx
    py = dy * ah + acy
    pw = jnp.exp(dw) * aw
    ph = jnp.exp(dh) * ah
    x1 = px - 0.5 * pw
    y1 = py - 0.5 * ph
    x2 = px + 0.5 * pw
    y2 = py + 0.5 * ph
    if image_size is not None:
        h, w = image_size
        x1 = jnp.clip(x1, 0.0, float(w))
        x2 = jnp.clip(x2, 0.0, float(w))
        y1 = jnp.clip(y1, 0.0, float(h))
        y2 = jnp.clip(y2, 0.0, float(h))
    zeros = jnp.zeros_like(x1)
    out_ref[0] = jnp.concatenate(
        [x1, y1, x2, y2, zeros, zeros, zeros, zeros], axis=0)


def decode_boxes_pallas(
    deltas: Array,  # [B, N, 4]
    anchors: Array,  # [N, 4]
    std: Sequence[float] = (0.1, 0.1, 0.2, 0.2),
    image_size: Optional[Tuple[int, int]] = None,
    tile: int = 2048,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused decode(+clip) over the full anchor set, [B, N, 4] → [B, N, 4].

    Exact same math as :func:`detjax.ops.boxes.decode_boxes` /
    ``clip_boxes`` (SURVEY.md §2 #10/#11), tiled over the anchor axis.
    This is the TPU backend of the public
    :func:`detjax.ops.boxes.decode_clip_boxes` (the reference's
    ``BBoxTransform``→``ClipBoxes`` full-set contract); the production
    detect path instead gathers ~1k candidates before decoding
    (ops/nms._select_candidates), which supersedes full-set decode there.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = not pallas_available()
    b, n, _ = deltas.shape
    tile = min(tile, _round_up(n, _LANE))
    n_pad = _round_up(n, tile)

    dt = jnp.transpose(deltas.astype(jnp.float32), (0, 2, 1))  # [B,4,N]
    dt = jnp.pad(dt, ((0, 0), (0, 4), (0, n_pad - n)))  # [B,8,Np]
    at = jnp.transpose(anchors.astype(jnp.float32), (1, 0))  # [4,N]
    # pad anchors with w=h=1 unit boxes to keep exp/log finite in the pad
    at = jnp.pad(at, ((0, 4), (0, n_pad - n)), constant_values=0.0)
    at = at.at[2:4, n:].set(1.0)

    kernel = functools.partial(
        _decode_kernel, std=tuple(float(s) for s in std),
        image_size=image_size)

    def _call(dt, at):
        bb = dt.shape[0]  # local (per-shard) batch under pjit
        return pl.pallas_call(
            kernel,
            grid=(bb, n_pad // tile),
            in_specs=[
                pl.BlockSpec((1, 8, tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, tile), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bb, 8, n_pad), jnp.float32),
            interpret=interpret,
        )(dt, at)

    # batch-SPMD rule: per-shard decode under pjit (see kernels/spmd.py)
    from detjax.kernels.spmd import batch_spmd_call

    out = batch_spmd_call(
        _call, (dt, at), (True, False),
        key=("decode", tuple(float(s) for s in std), image_size, tile,
             interpret))
    return jnp.transpose(out[:, :4, :n], (0, 2, 1))
