"""Vectorized anchor↔GT matching / target assignment (SURVEY.md §2 #7).

The reference computes IoU and argmax assignment inside a per-image Python
loop in ``FocalLoss.forward`` (SURVEY.md §3.1 "★ PER-IMAGE PYTHON LOOP" —
the known CPU bottleneck). Here matching is a single batched, jit-compiled
function over fixed shapes: GT is padded to ``max_gt`` with a validity mask,
and the whole [B, A, G] IoU + argmax runs on-device in one fused XLA region.

Assignment rule (RetinaNet standard, lineage thresholds):
  - anchor's best GT = argmax IoU over valid GTs
  - positive  if best IoU >= fg_iou_threshold (0.5)
  - negative  if best IoU <  bg_iou_threshold (0.4)
  - ignored   otherwise (no loss)
Padded GTs are masked to IoU = -1 so they can never win the argmax.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from detjax.ops.boxes import box_iou

Array = jnp.ndarray


class MatchResult(NamedTuple):
    """Per-anchor assignment. Leading batch dims follow the inputs."""

    matched_gt: Array  # [..., A] int32 — index of assigned GT (argmax; valid only where positive)
    matched_labels: Array  # [..., A] int32 — class of assigned GT for positives, -1 elsewhere
    matched_boxes: Array  # [..., A, 4] — box of assigned GT (zeros where not positive)
    positive: Array  # [..., A] bool
    negative: Array  # [..., A] bool  (ignore = ~positive & ~negative)
    max_iou: Array  # [..., A] float


def _match_single(
    anchors: Array,  # [A, 4]
    gt_boxes: Array,  # [G, 4]
    gt_labels: Array,  # [G] int32, -1 = padding
    fg_iou_threshold: float,
    bg_iou_threshold: float,
) -> MatchResult:
    valid = gt_labels >= 0  # [G]
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(valid[None, :], iou, -1.0)
    matched_gt = jnp.argmax(iou, axis=-1).astype(jnp.int32)  # [A]
    max_iou = jnp.max(iou, axis=-1)  # [A]
    any_valid = jnp.any(valid)
    positive = (max_iou >= fg_iou_threshold) & any_valid
    negative = max_iou < bg_iou_threshold  # covers the no-GT case (max_iou = -1)
    labels = jnp.take(gt_labels, matched_gt, axis=0)
    matched_labels = jnp.where(positive, labels, -1).astype(jnp.int32)
    boxes = jnp.take(gt_boxes, matched_gt, axis=0)
    matched_boxes = jnp.where(positive[:, None], boxes, 0.0)
    return MatchResult(matched_gt, matched_labels, matched_boxes,
                       positive, negative, max_iou)


def match_anchors(
    anchors: Array,
    gt_boxes: Array,
    gt_labels: Array,
    fg_iou_threshold: float = 0.5,
    bg_iou_threshold: float = 0.4,
    backend: str = "auto",  # "auto" | "pallas" | "lax"
) -> MatchResult:
    """Batched matching.

    Args:
      anchors: [A, 4] xyxy (shared across the batch — a trace-time constant).
      gt_boxes: [B, G, 4] xyxy, padded.
      gt_labels: [B, G] int32 class ids in [0, K); ``-1`` marks padding.
      backend: "pallas" streams the [A, G] IoU through VMEM tiles (never
        materializing [B, A, G] in HBM — detjax.kernels.matching); "lax" is
        the broadcast oracle; "auto" picks pallas on TPU.

    Returns a :class:`MatchResult` with leading batch dim B.
    """
    if gt_boxes.ndim == 2:
        return _match_single(anchors, gt_boxes, gt_labels,
                             fg_iou_threshold, bg_iou_threshold)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "lax"
    if backend == "pallas":
        from detjax.kernels.matching import match_iou_pallas

        max_iou, matched_gt, mboxes, mlabels_raw = match_iou_pallas(
            anchors, gt_boxes, gt_labels >= 0, gt_labels)
        # assignment is a non-differentiable decision; targets are
        # constants in the loss (lineage semantics) — also keeps AD from
        # ever requesting a VJP of the kernel
        max_iou = jax.lax.stop_gradient(max_iou)
        mboxes = jax.lax.stop_gradient(mboxes)
        valid = gt_labels >= 0
        any_valid = jnp.any(valid, axis=-1, keepdims=True)
        positive = (max_iou >= fg_iou_threshold) & any_valid
        negative = max_iou < bg_iou_threshold
        matched_labels = jnp.where(positive, mlabels_raw, -1).astype(jnp.int32)
        matched_boxes = jnp.where(positive[..., None], mboxes, 0.0)
        return MatchResult(matched_gt, matched_labels, matched_boxes,
                           positive, negative, max_iou)
    fn = lambda b, l: _match_single(anchors, b, l, fg_iou_threshold, bg_iou_threshold)
    return jax.vmap(fn)(gt_boxes, gt_labels)
