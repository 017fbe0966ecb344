"""Torch (CPU) replica of the detection math for differential testing.

SURVEY.md §4.2: a minimal torch implementation of matching / focal /
smooth-L1 / decode with the exact same conventions as detjax, so the JAX
code can be diffed bit-for-bit(-ish, fp32 ulp) against an independent
framework. This mirrors the reference lineage's FocalLoss/BBoxTransform
behavior (SURVEY.md §2 #7–#10) including the per-image normalization.
"""

from __future__ import annotations

import torch

STD = torch.tensor([0.1, 0.1, 0.2, 0.2])


def iou_t(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0))
    area_b = ((b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0))
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union.clamp(min=1e-8)


def match_t(anchors, gt_boxes, gt_labels, fg=0.5, bg=0.4):
    """Returns (matched_labels [A], matched_boxes [A,4], pos [A], neg [A])."""
    a = anchors.shape[0]
    valid = gt_labels >= 0
    if valid.sum() == 0:
        return (torch.full((a,), -1, dtype=torch.long),
                torch.zeros(a, 4),
                torch.zeros(a, dtype=torch.bool),
                torch.ones(a, dtype=torch.bool))
    iou = iou_t(anchors, gt_boxes)
    iou[:, ~valid] = -1.0
    max_iou, argmax = iou.max(dim=1)
    pos = max_iou >= fg
    neg = max_iou < bg
    labels = gt_labels[argmax]
    labels = torch.where(pos, labels, torch.full_like(labels, -1))
    boxes = gt_boxes[argmax] * pos[:, None]
    return labels, boxes, pos, neg


def focal_t(logits, matched_labels, pos, neg, alpha=0.25, gamma=2.0):
    """Per-image focal loss from logits — same stable formulation as detjax."""
    k = logits.shape[-1]
    targets = torch.zeros_like(logits)
    has = matched_labels >= 0
    targets[has, matched_labels[has].clamp(min=0)] = 1.0
    p = torch.sigmoid(logits)
    ce = targets * torch.nn.functional.softplus(-logits) + \
        (1 - targets) * torch.nn.functional.softplus(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * alpha + (1 - targets) * (1 - alpha)
    loss = alpha_t * (1 - p_t) ** gamma * ce
    weight = (pos | neg).float()[:, None]
    num_pos = pos.float().sum().clamp(min=1.0)
    return (loss * weight).sum() / num_pos


def encode_t(gt, anchors):
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    gw = (gt[:, 2] - gt[:, 0]).clamp(min=1.0)
    gh = (gt[:, 3] - gt[:, 1]).clamp(min=1.0)
    gx = gt[:, 0] + 0.5 * (gt[:, 2] - gt[:, 0])
    gy = gt[:, 1] + 0.5 * (gt[:, 3] - gt[:, 1])
    d = torch.stack([(gx - ax) / aw, (gy - ay) / ah,
                     torch.log(gw / aw), torch.log(gh / ah)], dim=-1)
    return d / STD


def smooth_l1_t(reg, targets, pos, beta=1.0 / 9.0):
    diff = (reg - targets).abs()
    loss = torch.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if pos.sum() == 0:
        return torch.tensor(0.0)
    return loss[pos].mean()


def decode_t(deltas, anchors):
    deltas = deltas * STD
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + 0.5 * aw
    ay = anchors[:, 1] + 0.5 * ah
    px = deltas[:, 0] * aw + ax
    py = deltas[:, 1] * ah + ay
    pw = torch.exp(deltas[:, 2]) * aw
    ph = torch.exp(deltas[:, 3]) * ah
    return torch.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], -1)
