"""Vectorized, static-shape detection ops (SURVEY.md §2 #6–#12).

All functions are pure, jit-compatible, and operate on fixed-shape arrays.
The reference's per-image Python loops (SURVEY.md §3.1 "PER-IMAGE PYTHON
LOOP") are replaced with batched ``[B, A, G]`` broadcasting on-device.
"""

from detjax.ops.anchors import AnchorConfig, generate_anchors, anchors_for_shape
from detjax.ops.boxes import (
    box_iou,
    encode_boxes,
    decode_boxes,
    clip_boxes,
    decode_clip_boxes,
)
from detjax.ops.matching import match_anchors
from detjax.ops.losses import focal_loss, smooth_l1_loss, detection_loss
from detjax.ops.nms import (
    class_aware_nms,
    nms_single_class,
    batched_detect_postprocess,
    fused_detect_postprocess,
)

__all__ = [
    "AnchorConfig",
    "generate_anchors",
    "anchors_for_shape",
    "box_iou",
    "encode_boxes",
    "decode_boxes",
    "clip_boxes",
    "decode_clip_boxes",
    "match_anchors",
    "focal_loss",
    "smooth_l1_loss",
    "detection_loss",
    "class_aware_nms",
    "nms_single_class",
    "batched_detect_postprocess",
    "fused_detect_postprocess",
]
