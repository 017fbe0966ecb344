"""Pure-numpy reference implementations used as test oracles.

Independent re-derivations of the standard detection math (SURVEY.md §4.1
"golden values ... NMS against a numpy reference implementation"). Kept
deliberately naive/loopy — clarity over speed.
"""

from __future__ import annotations

import numpy as np


def iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4] × [M,4] → [N,M] IoU, xyxy."""
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for i, (ax1, ay1, ax2, ay2) in enumerate(a):
        for j, (bx1, by1, bx2, by2) in enumerate(b):
            ix1, iy1 = max(ax1, bx1), max(ay1, by1)
            ix2, iy2 = min(ax2, bx2), min(ay2, by2)
            iw, ih = max(ix2 - ix1, 0.0), max(iy2 - iy1, 0.0)
            inter = iw * ih
            ua = max(ax2 - ax1, 0) * max(ay2 - ay1, 0)
            ub = max(bx2 - bx1, 0) * max(by2 - by1, 0)
            union = ua + ub - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def nms_np(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
           max_output: int = 10**9) -> list:
    """Greedy NMS, torchvision semantics: sort desc (ties → lower index
    first), suppress iou > threshold. Returns kept indices in keep order."""
    order = np.argsort(-scores, kind="stable")
    keep: list = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for idx in order:
        if suppressed[idx] or len(keep) >= max_output:
            continue
        keep.append(int(idx))
        ious = iou_np(boxes[idx][None], boxes)[0]
        suppressed |= ious > iou_threshold
        suppressed[idx] = True
    return keep


def encode_np(gt: np.ndarray, anchors: np.ndarray,
              std=(0.1, 0.1, 0.2, 0.2)) -> np.ndarray:
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    gw = np.maximum(gt[:, 2] - gt[:, 0], 1.0)
    gh = np.maximum(gt[:, 3] - gt[:, 1], 1.0)
    gx = gt[:, 0] + 0.5 * (gt[:, 2] - gt[:, 0])
    gy = gt[:, 1] + 0.5 * (gt[:, 3] - gt[:, 1])
    d = np.stack([(gx - ax) / aw, (gy - ay) / ah,
                  np.log(gw / aw), np.log(gh / ah)], axis=-1)
    return d / np.asarray(std)


def decode_np(deltas: np.ndarray, anchors: np.ndarray,
              std=(0.1, 0.1, 0.2, 0.2)) -> np.ndarray:
    deltas = deltas * np.asarray(std)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    px = deltas[:, 0] * aw + ax
    py = deltas[:, 1] * ah + ay
    pw = np.exp(deltas[:, 2]) * aw
    ph = np.exp(deltas[:, 3]) * ah
    return np.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], -1)
