"""Host-side geometric transforms on fixed canvases (SURVEY.md §2 #14).

The reference resizes to a variable min-608/max-1024 side then pads each
BATCH to its max size (dynamic shapes). TPU-first replacement: letterbox
every image onto a FIXED (H, W) canvas — aspect-preserving scale + top-left
padding — so every batch has the same shape and the train step never
retraces. Scale factors are returned so detections can be mapped back to
original coordinates (the reference's ``1/resize_scale`` step, SURVEY.md
§3.2 last line).

Photometric normalization and horizontal flip run ON DEVICE inside the
jitted step (see ``detjax.data.pipeline.device_augment``); the host-side
flip/crop here exist for the eval path and for pipelines that want host aug.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def protocol_scale(h: int, w: int, min_side: int = 608,
                   max_side: int = 1024) -> float:
    """The reference Resizer's scale rule (SURVEY.md §2 #14, §3.2):
    scale the SHORT side to ``min_side``, capped so the LONG side never
    exceeds ``max_side`` — i.e. ``min(min_side/min(h,w), max_side/max(h,w))``.
    A 480×640 val2017 image gets 608/480 = 1.2667 (not 1024/640 = 1.6);
    a 1024×2048 image gets 1024/2048 = 0.5. Small images UP-scale."""
    return min(min_side / min(h, w), max_side / max(h, w))


def protocol_canvas(h: int, w: int, min_side: int = 608,
                    max_side: int = 1024, pad_stride: int = 32
                    ) -> Tuple[Tuple[int, int], float]:
    """The reference Resizer's OUTPUT geometry for an (h, w) source
    (SURVEY.md §2 #14, §3.2): protocol scale, bilinear resize to the
    rounded size, zero-pad bottom/right to a multiple of ``pad_stride``.
    Returns ``((canvas_h, canvas_w), scale)`` — the per-image variable
    canvas the protocol evaluator buckets on. The canvas family is finite
    (short side ≈ min_side, long side ≤ pad-rounded max_side), so eval
    compiles one detect engine per DISTINCT canvas, not per image."""
    scale = protocol_scale(h, w, min_side, max_side)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    ph = -(-nh // pad_stride) * pad_stride
    pw = -(-nw // pad_stride) * pad_stride
    return (ph, pw), scale


def _resize_u8(image: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Bilinear uint8 resize through the in-repo C++ kernel (bit-identical
    to PIL BILINEAR — pinned in tests/test_native.py), PIL fallback."""
    if (nh, nw) == image.shape[:2]:
        return image
    from detjax import native

    if native.available():
        return native.resize_bilinear(image, nh, nw)
    from PIL import Image

    return np.asarray(
        Image.fromarray(image).resize((nw, nh), Image.BILINEAR), np.uint8)


def letterbox_protocol(
    image: np.ndarray,  # [h, w, 3] uint8
    boxes: np.ndarray,  # [n, 4] xyxy in source coords
    canvas_hw: Tuple[int, int],
    min_side: int = 608,
    max_side: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Reproduce the reference Resizer's content EXACTLY on a given
    protocol canvas (normally :func:`protocol_canvas`'s output for this
    image): protocol scale — NOT canvas-fit, so the resized size is
    bit-identical to the reference's ``round(h*scale) × round(w*scale)``
    even when pad-rounding makes the canvas slightly "looser" than the
    content — top-left placement, zero pad. Returns
    ``(canvas uint8 [H,W,3], boxes in canvas coords, scale)``."""
    th, tw = canvas_hw
    h, w = image.shape[:2]
    scale = protocol_scale(h, w, min_side, max_side)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    if nh > th or nw > tw:
        raise ValueError(
            f"protocol content {nh}x{nw} exceeds canvas {th}x{tw} "
            f"(source {h}x{w}, min/max {min_side}/{max_side})")
    canvas = np.zeros((th, tw, 3), np.uint8)
    canvas[:nh, :nw] = _resize_u8(image, nh, nw)
    out_boxes = boxes.astype(np.float32) * scale
    np.clip(out_boxes[:, 0::2], 0, nw, out=out_boxes[:, 0::2])
    np.clip(out_boxes[:, 1::2], 0, nh, out=out_boxes[:, 1::2])
    return canvas, out_boxes, scale


def letterbox(
    image: np.ndarray,  # [h, w, 3] uint8
    boxes: np.ndarray,  # [n, 4] xyxy in source coords
    target_hw: Tuple[int, int],
    scale_minmax: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Aspect-preserving resize onto a fixed canvas. Returns
    (canvas uint8 [H,W,3], boxes in canvas coords, scale).

    Default scale is canvas-fit (``min(th/h, tw/w)`` — fills the fixed
    canvas, the TPU-first training rule). With ``scale_minmax=(608, 1024)``
    the reference eval protocol's :func:`protocol_scale` rule is used
    instead (still capped by canvas fit so the result always fits), which
    makes object-scale statistics match the reference's variable-resolution
    eval exactly — required for the ±0.2 mAP parity gate.

    The resize runs through the in-repo C++ bilinear kernel
    (detjax.native — the data loader's native substrate, SURVEY.md §2a)
    when the toolchain is available, else PIL. The two paths are
    BIT-IDENTICAL (the C++ kernel implements Pillow's antialiased
    triangle resample per bit — pinned in tests/test_native.py), so the
    pipeline output does not depend on which substrate built it.
    """
    th, tw = target_hw
    h, w = image.shape[:2]
    scale = min(th / h, tw / w)
    if scale_minmax is not None:
        scale = min(scale, protocol_scale(h, w, *scale_minmax))
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    canvas = np.zeros((th, tw, 3), np.uint8)
    canvas[:nh, :nw] = _resize_u8(image, nh, nw)
    out_boxes = boxes.astype(np.float32) * scale
    np.clip(out_boxes[:, 0::2], 0, nw, out=out_boxes[:, 0::2])
    np.clip(out_boxes[:, 1::2], 0, nh, out=out_boxes[:, 1::2])
    return canvas, out_boxes, scale


def hflip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    """Mirror xyxy boxes horizontally inside [0, width]."""
    out = boxes.copy()
    out[:, 0] = width - boxes[:, 2]
    out[:, 2] = width - boxes[:, 0]
    return out


def random_crop(
    image: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.Generator,
    min_scale: float = 0.3,
    max_scale: float = 1.0,
    min_box_coverage: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random sub-window crop; keeps boxes whose area survives ≥coverage.

    Mirrors the lineage's crop augmentation (SURVEY.md §2 #14 "random
    crop"): boxes are clipped to the window and dropped if mostly cut away.
    """
    h, w = image.shape[:2]
    s = rng.uniform(min_scale, max_scale)
    ch, cw = max(1, int(h * s)), max(1, int(w * s))
    y0 = int(rng.integers(0, h - ch + 1))
    x0 = int(rng.integers(0, w - cw + 1))
    crop = image[y0:y0 + ch, x0:x0 + cw]
    if len(boxes) == 0:
        return crop, boxes.reshape(0, 4), labels
    shifted = boxes - np.asarray([x0, y0, x0, y0], np.float32)
    clipped = shifted.copy()
    np.clip(clipped[:, 0::2], 0, cw, out=clipped[:, 0::2])
    np.clip(clipped[:, 1::2], 0, ch, out=clipped[:, 1::2])
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    new_area = np.maximum(clipped[:, 2] - clipped[:, 0], 0) * np.maximum(
        clipped[:, 3] - clipped[:, 1], 0)
    keep = new_area >= min_box_coverage * np.maximum(area, 1e-6)
    keep &= new_area > 1.0
    return crop, clipped[keep], labels[keep]


def normalize_image(image: np.ndarray, mean=None, std=None) -> np.ndarray:
    """uint8 [0,255] → float32 normalized (host-side variant); mean/std
    default to ImageNet (pass ``cfg.data.mean/std`` to override)."""
    x = image.astype(np.float32) / 255.0
    mean = IMAGENET_MEAN if mean is None else np.asarray(mean, np.float32)
    std = IMAGENET_STD if std is None else np.asarray(std, np.float32)
    return (x - mean) / std


def pad_annotations(
    boxes: np.ndarray, labels: np.ndarray, max_gt: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/truncate to [max_gt] with label −1 sentinel (static shapes)."""
    n = min(len(boxes), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.full((max_gt,), -1, np.int32)
    out_boxes[:n] = boxes[:n]
    out_labels[:n] = labels[:n]
    return out_boxes, out_labels
