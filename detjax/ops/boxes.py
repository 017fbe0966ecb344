"""Box ops: pairwise IoU, delta encode/decode, clipping (SURVEY.md §2 #7/#9/#10/#11).

All xyxy float boxes. Pure jnp; broadcast-batched; no Python loops.
Encoding convention (lineage-standard, Faster-RCNN deltas with std
normalization [0.1, 0.1, 0.2, 0.2] and zero mean):

    dx = (gx_c - ax_c) / aw / std_x      dw = log(gw / aw) / std_w
    dy = (gy_c - ay_c) / ah / std_y      dh = log(gh / ah) / std_h

``decode_boxes`` is the exact inverse (SURVEY.md §2 #10 ``BBoxTransform``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp

Array = jnp.ndarray

DEFAULT_BOX_STD = (0.1, 0.1, 0.2, 0.2)


def box_area(boxes: Array) -> Array:
    """[..., 4] xyxy → [...] area (clamped at 0)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(boxes_a: Array, boxes_b: Array) -> Array:
    """Pairwise IoU. boxes_a [..., N, 4], boxes_b [..., M, 4] → [..., N, M].

    Vectorized replacement for the reference's ``calc_iou`` called inside a
    per-image Python loop (SURVEY.md §3.1); here the batch dims broadcast so
    a whole [B, A, G] IoU tensor is one fused XLA op.
    """
    a = boxes_a[..., :, None, :]  # [..., N, 1, 4]
    b = boxes_b[..., None, :, :]  # [..., 1, M, 4]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(boxes_a)[..., :, None]
    area_b = box_area(boxes_b)[..., None, :]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-8)


def _to_cxcywh(boxes: Array) -> Tuple[Array, Array, Array, Array]:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(
    gt_boxes: Array,
    anchors: Array,
    std: Sequence[float] = DEFAULT_BOX_STD,
) -> Array:
    """GT boxes → regression targets w.r.t. anchors. Shapes broadcast; [..., 4]."""
    gx, gy, gw, gh = _to_cxcywh(gt_boxes)
    ax, ay, aw, ah = _to_cxcywh(anchors)
    gw = jnp.maximum(gw, 1.0)  # lineage clamps GT w/h at 1px before log
    gh = jnp.maximum(gh, 1.0)
    dx = (gx - ax) / aw
    dy = (gy - ay) / ah
    dw = jnp.log(gw / aw)
    dh = jnp.log(gh / ah)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    return deltas / jnp.asarray(std, dtype=deltas.dtype)


def decode_boxes(
    deltas: Array,
    anchors: Array,
    std: Sequence[float] = DEFAULT_BOX_STD,
) -> Array:
    """Regression deltas + anchors → xyxy boxes (inverse of encode_boxes)."""
    deltas = deltas * jnp.asarray(std, dtype=deltas.dtype)
    ax, ay, aw, ah = _to_cxcywh(anchors)
    px = deltas[..., 0] * aw + ax
    py = deltas[..., 1] * ah + ay
    pw = jnp.exp(deltas[..., 2]) * aw
    ph = jnp.exp(deltas[..., 3]) * ah
    return jnp.stack(
        [px - 0.5 * pw, py - 0.5 * ph, px + 0.5 * pw, py + 0.5 * ph], axis=-1
    )


def clip_boxes(boxes: Array, image_size: Tuple[int, int]) -> Array:
    """Clamp xyxy boxes to [0, W] × [0, H] (SURVEY.md §2 #11 ``ClipBoxes``)."""
    h, w = image_size
    lo = jnp.zeros((4,), dtype=boxes.dtype)
    hi = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def decode_clip_boxes(
    deltas: Array,  # [B, A, 4]
    anchors: Array,  # [A, 4]
    image_size: Tuple[int, int],
    std: Sequence[float] = DEFAULT_BOX_STD,
    backend: str = "auto",  # "auto" | "pallas" | "jnp"
) -> Array:
    """Fused full-anchor-set decode + clip — the public composition of the
    reference's ``BBoxTransform`` → ``ClipBoxes`` eval-branch pair
    (SURVEY.md §3.2).

    ``backend="auto"`` runs the Pallas VMEM-tiled kernel on TPU
    (detjax.kernels.postprocess.decode_boxes_pallas) and plain jnp
    elsewhere; results are identical. Note the production detect path does
    NOT decode the full set — it gathers ~1k candidates first
    (ops/nms._select_candidates), which supersedes full-set decoding; this
    API exists for users who want all-anchor boxes (the reference's
    BBoxTransform contract).
    """
    import jax

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas":
        from detjax.kernels.postprocess import decode_boxes_pallas

        return decode_boxes_pallas(deltas, anchors, std=std,
                                   image_size=image_size)
    return clip_boxes(decode_boxes(deltas, anchors, std), image_size)
