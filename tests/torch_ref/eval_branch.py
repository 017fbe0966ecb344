"""Torch (CPU) replica of the reference's FULL eval branch and training
loss loop — the end-to-end half of the differential suite (VERDICT r3 #1).

`detection_math.py` replicates the individual ops; this module composes
them into the two reference call stacks that were never diffed end to end:

- **eval branch** (SURVEY.md §3.2): variable-size Resizer (scale short
  side to 608 capped at long side 1024, pad to stride 32) → normalize →
  backbone→FPN→heads forward → sigmoid → BBoxTransform decode → ClipBoxes
  → score>0.05 → per-class Python NMS loop at IoU 0.5 → concat survivors →
  top detections → rescale to original coordinates.
- **training loss loop** (SURVEY.md §3.1): forward → per-image Python
  matching loop → focal + smooth-L1, per-image #pos normalization, batch
  mean.

Everything here is plain torch/numpy — no detjax imports on the compute
path — so agreement with detjax is evidence of independent correctness,
not shared code. Weights arrive as a lineage-format state_dict (either a
real reference checkpoint or `detjax.utils.torch_import.export_full_detector`
output from a detjax-trained model).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import torch

from tests.torch_ref.detection_math import (
    decode_t,
    focal_t,
    match_t,
    smooth_l1_t,
    encode_t,
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ---------------------------------------------------------------------------
# Anchors (SURVEY.md §2 #6) — independent torch derivation of the lineage's
# generate_anchors/shift: ratio-major × scale-minor per cell, row-major
# (y, x) grid, anchor-minor flattening, centers at (i + 0.5) * stride.
# ---------------------------------------------------------------------------

def anchors_t(image_hw: Tuple[int, int], min_level: int = 3,
              max_level: int = 7,
              scales: Sequence[float] = (2 ** 0, 2 ** (1 / 3), 2 ** (2 / 3)),
              ratios: Sequence[float] = (0.5, 1.0, 2.0),
              base_scale: float = 4.0,
              per_level_sizes: Optional[Sequence[Sequence[float]]] = None,
              ) -> torch.Tensor:
    """[ΣA, 4] xyxy float32 anchors over all pyramid levels.

    ``per_level_sizes`` (SSD-style, SURVEY.md §2 #5): absolute per-level
    anchor sizes in pixels — one tuple per level — replacing the RetinaNet
    ``base_scale × stride × scales`` rule.
    """
    h, w = image_hw
    out = []
    for lvl in range(min_level, max_level + 1):
        stride = 2 ** lvl
        fh, fw = -(-h // stride), -(-w // stride)
        if per_level_sizes is not None:
            base, lvl_scales = 1.0, per_level_sizes[lvl - min_level]
        else:
            base, lvl_scales = base_scale * stride, scales
        cell = []
        for r in ratios:
            for s in lvl_scales:
                area = (base * s) ** 2
                cw = math.sqrt(area / r)
                ch = cw * r
                cell.append([-cw / 2, -ch / 2, cw / 2, ch / 2])
        cell_t = torch.tensor(cell, dtype=torch.float64)  # [A, 4]
        cy = (torch.arange(fh, dtype=torch.float32) + 0.5) * stride
        cx = (torch.arange(fw, dtype=torch.float32) + 0.5) * stride
        shift = torch.stack(
            [cx[None, :].expand(fh, fw), cy[:, None].expand(fh, fw),
             cx[None, :].expand(fh, fw), cy[:, None].expand(fh, fw)],
            dim=-1)  # [fh, fw, 4]
        a = shift[:, :, None, :] + cell_t[None, None, :, :].float()
        out.append(a.reshape(-1, 4))
    return torch.cat(out, dim=0)


# ---------------------------------------------------------------------------
# Full detector forward (backbone → PyramidFeatures → shared heads), generic
# over stage sizes and block type — multi-block stages included, so a real
# R50 ([3,4,6,3]) lineage checkpoint runs as-is.
# ---------------------------------------------------------------------------

def detector_forward_t(sd: Dict[str, np.ndarray], x_nchw: np.ndarray,
                       stage_sizes: Sequence[int], num_classes: int,
                       block: str = "bottleneck",
                       num_head_convs: int = 4,
                       family: str = "retinanet",
                       ) -> Tuple[torch.Tensor, torch.Tensor]:
    """Lineage detector forward in raw torch.nn.functional.

    Returns ``(cls_logits [B, ΣA, K], box_deltas [B, ΣA, 4])`` in the
    lineage's anchor-major flattening (matches detjax's head layout —
    verified in tests/test_torch_import.py). ``family``: "retinanet"
    (shared 4×conv towers) or "ssd" (one independent 3×3 predictor pair
    per level — benchmark config 2, weights under ``ssdHead.{cls,box}_p{l}``
    per detjax.utils.torch_import._ssd_head_key_map).
    """
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.ascontiguousarray(v)).float()
         for k, v in sd.items()}

    def bn(x, p):
        return F.batch_norm(x, t[f"{p}.running_mean"], t[f"{p}.running_var"],
                            t[f"{p}.weight"], t[f"{p}.bias"],
                            training=False, eps=1e-5)

    def conv(x, p, stride=1, padding=0):
        return F.conv2d(x, t[f"{p}.weight"], t.get(f"{p}.bias"),
                        stride=stride, padding=padding)

    with torch.no_grad():
        x = torch.from_numpy(np.ascontiguousarray(x_nchw)).float()
        x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
        x = F.relu(bn(x, "bn1"))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        feats = {}
        for s, n_blocks in enumerate(stage_sizes):
            for b in range(n_blocks):
                p = f"layer{s + 1}.{b}"
                stride = 1 if (s == 0 or b > 0) else 2
                has_proj = f"{p}.downsample.0.weight" in t
                idn = (bn(F.conv2d(x, t[f"{p}.downsample.0.weight"],
                                   stride=stride), f"{p}.downsample.1")
                       if has_proj else x)
                if block == "bottleneck":
                    y = F.relu(bn(F.conv2d(x, t[f"{p}.conv1.weight"]),
                                  f"{p}.bn1"))
                    y = F.relu(bn(F.conv2d(y, t[f"{p}.conv2.weight"],
                                           stride=stride, padding=1),
                                  f"{p}.bn2"))
                    y = bn(F.conv2d(y, t[f"{p}.conv3.weight"]), f"{p}.bn3")
                else:  # basic
                    y = F.relu(bn(F.conv2d(x, t[f"{p}.conv1.weight"],
                                           stride=stride, padding=1),
                                  f"{p}.bn1"))
                    y = bn(F.conv2d(y, t[f"{p}.conv2.weight"], padding=1),
                           f"{p}.bn2")
                x = F.relu(y + idn)
            feats[s + 2] = x
        c3, c4, c5 = feats[3], feats[4], feats[5]

        # PyramidFeatures (lineage order of ops)
        p5 = conv(c5, "fpn.P5_1")
        p5_up = F.interpolate(p5, size=c4.shape[-2:], mode="nearest")
        p5 = conv(p5, "fpn.P5_2", padding=1)
        p4 = conv(c4, "fpn.P4_1") + p5_up
        p4_up = F.interpolate(p4, size=c3.shape[-2:], mode="nearest")
        p4 = conv(p4, "fpn.P4_2", padding=1)
        p3 = conv(c3, "fpn.P3_1") + p4_up
        p3 = conv(p3, "fpn.P3_2", padding=1)
        p6 = conv(c5, "fpn.P6", stride=2, padding=1)
        p7 = conv(F.relu(p6), "fpn.P7_2", stride=2, padding=1)

        cls_all, box_all = [], []
        for lvl_num, lvl in zip(range(3, 8), (p3, p4, p5, p6, p7)):
            if family == "ssd":
                c = conv(lvl, f"ssdHead.cls_p{lvl_num}", padding=1)
                r = conv(lvl, f"ssdHead.box_p{lvl_num}", padding=1)
            else:
                c = lvl
                for i in range(1, num_head_convs + 1):
                    c = F.relu(conv(c, f"classificationModel.conv{i}",
                                    padding=1))
                c = conv(c, "classificationModel.output", padding=1)
                r = lvl
                for i in range(1, num_head_convs + 1):
                    r = F.relu(conv(r, f"regressionModel.conv{i}",
                                    padding=1))
                r = conv(r, "regressionModel.output", padding=1)
            b_, _, h_, w_ = c.shape
            # (B, A·K, H, W) → (B, H, W, A, K) → (B, ·, K): anchor-major
            cls_all.append(c.permute(0, 2, 3, 1).reshape(b_, -1, num_classes))
            box_all.append(r.permute(0, 2, 3, 1).reshape(b_, -1, 4))
        return torch.cat(cls_all, dim=1), torch.cat(box_all, dim=1)


# ---------------------------------------------------------------------------
# Eval branch (SURVEY.md §3.2)
# ---------------------------------------------------------------------------

def nms_t(boxes: torch.Tensor, scores: torch.Tensor,
          iou_threshold: float) -> torch.Tensor:
    """torchvision-semantics greedy NMS: descending score, ties broken by
    lower input index, suppress at iou > threshold. Returns keep indices."""
    order = torch.argsort(scores, descending=True, stable=True)
    boxes = boxes[order].double()
    areas = ((boxes[:, 2] - boxes[:, 0]).clamp(min=0)
             * (boxes[:, 3] - boxes[:, 1]).clamp(min=0))
    n = boxes.shape[0]
    suppressed = torch.zeros(n, dtype=torch.bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(int(order[i]))
        lt = torch.max(boxes[i, :2], boxes[i + 1:, :2])
        rb = torch.min(boxes[i, 2:], boxes[i + 1:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        union = (areas[i] + areas[i + 1:] - inter).clamp(min=1e-8)
        suppressed[i + 1:] |= (inter / union) > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def resize_protocol_t(image_u8: np.ndarray, min_side: int = 608,
                      max_side: int = 1024, pad_stride: int = 32
                      ) -> Tuple[np.ndarray, float]:
    """The reference Resizer: scale the short side to ``min_side`` capped
    so the long side ≤ ``max_side``, bilinear resize, zero-pad bottom/right
    to a multiple of ``pad_stride``. Returns (padded float-ready uint8
    canvas, scale)."""
    from PIL import Image

    h, w = image_u8.shape[:2]
    scale = min(min_side / min(h, w), max_side / max(h, w))
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    if (nh, nw) != (h, w):
        resized = np.asarray(
            Image.fromarray(image_u8).resize((nw, nh), Image.BILINEAR),
            np.uint8)
    else:
        resized = image_u8
    ph = -(-nh // pad_stride) * pad_stride
    pw = -(-nw // pad_stride) * pad_stride
    canvas = np.zeros((ph, pw, 3), np.uint8)
    canvas[:nh, :nw] = resized
    return canvas, scale


def postprocess_t(
    cls_logits: torch.Tensor,  # [A, K] raw logits, one image
    deltas: torch.Tensor,  # [A, 4]
    canvas_hw: Tuple[int, int],
    *,
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
    anchor_kw: Optional[dict] = None,
    scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The reference eval branch AFTER the forward: sigmoid → decode →
    clip → score>threshold → per-class Python NMS loop → concat → top
    detections → rescale by 1/scale. One image."""
    ch, cw = canvas_hw
    scores_all = torch.sigmoid(cls_logits)  # [A, K]
    anchors = anchors_t((ch, cw), **(anchor_kw or {}))
    boxes_all = decode_t(deltas.float(), anchors)
    # ClipBoxes: clamp to the padded canvas bounds
    boxes_all[:, 0::2] = boxes_all[:, 0::2].clamp(0, cw)
    boxes_all[:, 1::2] = boxes_all[:, 1::2].clamp(0, ch)

    out_b: List[torch.Tensor] = []
    out_s: List[torch.Tensor] = []
    out_l: List[int] = []
    num_classes = scores_all.shape[1]
    for k in range(num_classes):  # ★ the reference's per-class Python loop
        mask = scores_all[:, k] > score_threshold
        if int(mask.sum()) == 0:
            continue
        b = boxes_all[mask]
        s = scores_all[mask, k]
        keep = nms_t(b, s, iou_threshold)
        out_b.append(b[keep])
        out_s.append(s[keep])
        out_l.extend([k] * len(keep))
    if not out_b:
        return (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                np.zeros((0,), np.int64))
    boxes = torch.cat(out_b)
    scores = torch.cat(out_s)
    labels = torch.tensor(out_l, dtype=torch.long)
    order = torch.argsort(scores, descending=True,
                          stable=True)[:max_detections]
    return ((boxes[order] / scale).numpy(), scores[order].numpy(),
            labels[order].numpy())


def normalize_t(canvas_u8: np.ndarray,
                mean: Sequence[float] = IMAGENET_MEAN,
                std: Sequence[float] = IMAGENET_STD) -> np.ndarray:
    """uint8 HWC (or BHWC) canvas → normalized float32 NCHW."""
    x = (canvas_u8.astype(np.float32) / 255.0
         - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    if x.ndim == 3:
        x = x[None]
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def eval_branch_t(
    sd: Dict[str, np.ndarray],
    image_u8: np.ndarray,  # [H, W, 3] uint8: raw image, or canvas (below)
    stage_sizes: Sequence[int],
    num_classes: int,
    *,
    block: str = "bottleneck",
    num_head_convs: int = 4,
    family: str = "retinanet",
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    min_side: int = 608,
    max_side: int = 1024,
    score_threshold: float = 0.05,
    iou_threshold: float = 0.5,
    max_detections: int = 100,
    anchor_kw: Optional[dict] = None,
    canvas_scale: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The reference's whole detect pipeline on ONE image.

    ``canvas_scale=None`` (protocol mode): the variable-size Resizer runs.
    ``canvas_scale=s`` (differential mode): ``image_u8`` is already a
    letterboxed canvas produced with scale ``s`` — the forward runs on it
    as-is, so detjax's fixed-canvas detect can be diffed on IDENTICAL
    pixels.

    Returns ``(boxes [N,4] xyxy in ORIGINAL coords, scores [N], labels
    [N])``, sorted by descending score, N ≤ max_detections.
    """
    if canvas_scale is None:
        canvas, scale = resize_protocol_t(image_u8, min_side, max_side)
    else:
        canvas, scale = image_u8, float(canvas_scale)
    ch, cw = canvas.shape[:2]
    x_nchw = normalize_t(canvas, mean, std)

    cls_logits, deltas = detector_forward_t(
        sd, x_nchw, stage_sizes, num_classes, block=block,
        num_head_convs=num_head_convs, family=family)
    return postprocess_t(
        cls_logits[0], deltas[0], (ch, cw),
        score_threshold=score_threshold, iou_threshold=iou_threshold,
        max_detections=max_detections, anchor_kw=anchor_kw, scale=scale)


# ---------------------------------------------------------------------------
# Training loss loop (SURVEY.md §3.1)
# ---------------------------------------------------------------------------

def loss_loop_t(
    sd: Dict[str, np.ndarray],
    images: np.ndarray,  # [B, H, W, 3] float32 NHWC, already normalized
    gt_boxes: np.ndarray,  # [B, G, 4]
    gt_labels: np.ndarray,  # [B, G] int, -1 padding
    stage_sizes: Sequence[int],
    num_classes: int,
    *,
    block: str = "bottleneck",
    num_head_convs: int = 4,
    family: str = "retinanet",
    fg: float = 0.5,
    bg: float = 0.4,
    alpha: float = 0.25,
    gamma: float = 2.0,
    beta: float = 1.0 / 9.0,
    anchor_kw: Optional[dict] = None,
) -> Tuple[float, float]:
    """The reference FocalLoss call: forward, then a per-image Python loop
    of IoU-match → focal + smooth-L1. Returns (cls_loss, reg_loss) means
    over the batch — the quantities `loss.backward()` would see."""
    b, h, w = images.shape[:3]
    x_nchw = np.ascontiguousarray(np.transpose(images, (0, 3, 1, 2)))
    cls_logits, deltas = detector_forward_t(
        sd, x_nchw, stage_sizes, num_classes, block=block,
        num_head_convs=num_head_convs, family=family)
    anchors = anchors_t((h, w), **(anchor_kw or {}))

    cls_losses, reg_losses = [], []
    for i in range(b):  # ★ the reference's per-image Python loop
        gb = torch.from_numpy(np.asarray(gt_boxes[i], np.float32))
        gl = torch.from_numpy(np.asarray(gt_labels[i], np.int64))
        labels, boxes, pos, neg = match_t(anchors, gb, gl, fg=fg, bg=bg)
        cls_losses.append(focal_t(cls_logits[i], labels, pos, neg,
                                  alpha=alpha, gamma=gamma))
        targets = encode_t(boxes, anchors)
        reg_losses.append(smooth_l1_t(deltas[i], targets, pos, beta=beta))
    return (float(torch.stack(cls_losses).mean()),
            float(torch.stack(reg_losses).mean()))
