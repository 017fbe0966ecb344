"""Focal + smooth-L1 losses, fully vectorized (SURVEY.md §2 #8/#9).

The reference computes these inside ``FocalLoss.forward`` with a per-image
Python loop (SURVEY.md §3.1); here they are masked batched ops over the
static ``[B, A]`` anchor grid, differentiable end-to-end and fused by XLA
into the backward pass of the heads.

Conventions (lineage-standard):
  - focal: sigmoid per-class, α = 0.25, γ = 2.0; background = all-zero
    one-hot; ignored anchors contribute 0; per-image sum normalized by
    max(#positives, 1); mean over batch.
  - smooth-L1: on std-normalized deltas of positive anchors, β = 1/9;
    per-image mean over positive anchor-coords (0 if no positives); mean
    over batch.
Numerics: computed from logits with log-sigmoid (stable) rather than the
lineage's clamp(p, 1e-4); the torch replica in tests/torch_ref mirrors this
exact formulation for bitwise diffing.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from detjax.ops.boxes import encode_boxes, DEFAULT_BOX_STD
from detjax.ops.matching import MatchResult, match_anchors

Array = jnp.ndarray


def _sigmoid_softplus_pair(x):
    """(σ(x), softplus(x), softplus(−x)) from ONE exp + ONE log1p.

    e = exp(−|x|), l = log1p(e):
      σ(x)        = x≥0 ? 1/(1+e) : e/(1+e)
      softplus(x) = x≥0 ? x + l   : l
      softplus(−x)= softplus(x) − x
    Same values as the jax.nn stable forms (identical branch structure),
    but the whole focal fwd+bwd then shares a single transcendental pair —
    the trace showed the fused focal pass VPU-bound at 14 % of HBM peak
    (docs/ROOFLINE.md round-3 revision), so transcendental count, not
    bytes, sets its speed.
    """
    nonneg = x >= 0
    e = jnp.exp(-jnp.abs(x))
    l = jnp.log1p(e)
    sig = jnp.where(nonneg, 1.0, e) / (1.0 + e)
    sp_pos = jnp.where(nonneg, x + l, l)  # softplus(x)
    return sig, sp_pos, sp_pos - x  # softplus(-x) = softplus(x) - x


def _focal_elem(logits, matched_labels, weight, alpha, gamma):
    """Elementwise focal loss → per-image sum over (A, K). [...] f32."""
    k = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    # One-hot targets; label -1 (non-positive) → all-zero row.
    targets = jax.nn.one_hot(matched_labels, k, dtype=jnp.float32)  # [..., A, K]
    p, sp_pos, sp_neg = _sigmoid_softplus_pair(logits)
    # Stable BCE from logits: log(p) = -softplus(-x), log(1-p) = -softplus(x)
    ce = targets * sp_neg + (1.0 - targets) * sp_pos
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    alpha_t = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    one_minus_pt = 1.0 - p_t
    if gamma == 2.0:  # pow lowers to exp∘log — squaring is pure VPU
        focal_w = one_minus_pt * one_minus_pt
    elif gamma == 1.0:
        focal_w = one_minus_pt
    else:
        focal_w = jnp.power(one_minus_pt, gamma)
    loss = alpha_t * focal_w * ce  # [..., A, K]
    return jnp.sum(loss * weight[..., None], axis=(-2, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _focal_sum(logits, matched_labels, weight, alpha, gamma):
    """Focal loss per-image sum with an ANALYTIC backward.

    XLA's autodiff of the focal chain keeps several [B, A, K] fp32
    residuals (p_t, ce, focal weights) alive between forward and backward —
    at the flagship shape that is >1 GB of HBM round-trips and ~3.4 ms of a
    94 ms step. The closed-form gradient

        dL/dx = α_t (2t−1) [ γ p_t (1−p_t)^γ log p_t − (1−p_t)^(γ+1) ]

    needs only the ORIGINAL inputs (logits, labels, weight), so forward and
    backward are each one fused elementwise pass. Verified against
    jax.grad of the reference formulation in tests/test_losses.py.
    """
    return _focal_elem(logits, matched_labels, weight, alpha, gamma)


def _focal_sum_fwd(logits, matched_labels, weight, alpha, gamma):
    out = _focal_elem(logits, matched_labels, weight, alpha, gamma)
    return out, (logits, matched_labels, weight)


def _focal_sum_bwd(alpha, gamma, res, g):
    logits, matched_labels, weight = res
    k = logits.shape[-1]
    x = logits.astype(jnp.float32)
    targets = jax.nn.one_hot(matched_labels, k, dtype=jnp.float32)
    sign = 2.0 * targets - 1.0  # (2t − 1)
    # p_t = σ(s·x), log_pt = log σ(s·x): selected from the single
    # exp/log1p pair on x (see _sigmoid_softplus_pair) instead of fresh
    # transcendentals on s·x — t=1 → (σ(x), −softplus(−x)),
    # t=0 → (1−σ(x), −softplus(x))
    p, sp_pos, sp_neg = _sigmoid_softplus_pair(x)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    log_pt = -(targets * sp_neg + (1.0 - targets) * sp_pos)
    alpha_t = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    one_minus = 1.0 - p_t
    if gamma == 2.0:
        pow_g = one_minus * one_minus
    elif gamma == 1.0:
        pow_g = one_minus
    else:
        pow_g = jnp.power(one_minus, gamma)
    dldx = alpha_t * sign * (gamma * p_t * pow_g * log_pt
                             - pow_g * one_minus)
    dlogits = (dldx * weight[..., None]
               * g[..., None, None]).astype(logits.dtype)
    return dlogits, None, None


_focal_sum.defvjp(_focal_sum_fwd, _focal_sum_bwd)


def focal_loss(
    logits: Array,  # [..., A, K]
    matched_labels: Array,  # [..., A] int32; class for positives, -1 else
    positive: Array,  # [..., A] bool
    negative: Array,  # [..., A] bool
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Array:
    """Per-image focal loss, normalized by #positives. Returns [...] floats."""
    weight = (positive | negative).astype(jnp.float32)  # ignore-zone anchors drop out
    total = _focal_sum(logits, matched_labels, weight, alpha, gamma)
    num_pos = jnp.maximum(jnp.sum(positive.astype(jnp.float32), axis=-1), 1.0)
    return total / num_pos


def smooth_l1_loss(
    reg: Array,  # [..., A, 4] predicted deltas
    reg_targets: Array,  # [..., A, 4] encoded GT deltas
    positive: Array,  # [..., A] bool
    beta: float = 1.0 / 9.0,
) -> Array:
    """Per-image smooth-L1 over positive anchors. Returns [...] floats."""
    reg = reg.astype(jnp.float32)
    diff = jnp.abs(reg - reg_targets.astype(jnp.float32))
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    pos = positive.astype(jnp.float32)[..., None]
    num = jnp.sum(loss * pos, axis=(-2, -1))
    den = jnp.maximum(jnp.sum(pos, axis=(-2, -1)) * 4.0, 1.0)  # pos anchors × 4 coords
    return num / den  # per-element mean over positives (lineage ``.mean()``)


class DetectionLossOutput(NamedTuple):
    cls_loss: Array  # scalar
    reg_loss: Array  # scalar
    metrics: Dict[str, Array]


def detection_loss_per_level(
    outputs: Dict[int, Tuple[Array, Array]],  # {level: (cls [B,H,W,A·K], box [B,H,W,A·4])}
    anchors: Array,  # [ΣA, 4] concatenated in ascending-level order
    level_sizes: Dict[int, int],  # {level: H·W·A}
    gt_boxes: Array,  # [B, G, 4]
    gt_labels: Array,  # [B, G]
    fg_iou_threshold: float = 0.5,
    bg_iou_threshold: float = 0.4,
    alpha: float = 0.25,
    gamma: float = 2.0,
    beta: float = 1.0 / 9.0,
    box_std: Sequence[float] = DEFAULT_BOX_STD,
) -> DetectionLossOutput:
    """Same math as :func:`detection_loss`, computed PER LEVEL on the
    heads' conv-native [B, H, W, A·K] layouts.

    The flattened path concatenates five [B, H·W·A, K] tensors (the
    reference's design, SURVEY.md §3.1); on TPU that flatten+concat is a
    physical relayout of ~200 MB in each direction of the step. Here
    matching runs once on the concatenated anchors (tiny [B, ΣA] tensors),
    the per-anchor targets are sliced per level — contiguous reshapes —
    and focal/smooth-L1 reduce the big head outputs in their native
    layout, so the loss fuses into the heads' epilogues.
    """
    m: MatchResult = match_anchors(
        anchors, gt_boxes, gt_labels, fg_iou_threshold, bg_iou_threshold)
    num_pos_vec = jnp.maximum(
        jnp.sum(m.positive.astype(jnp.float32), axis=-1), 1.0)  # [B]
    reg_targets = encode_boxes(m.matched_boxes, anchors[None, :, :], box_std)

    cls_sum = 0.0
    reg_sum = 0.0
    off = 0
    for level in sorted(outputs):
        cls4, box4 = outputs[level]
        b, h, w, _ = cls4.shape
        a = level_sizes[level] // (h * w)
        k = cls4.shape[-1] // a
        n = level_sizes[level]
        lab = jax.lax.dynamic_slice_in_dim(
            m.matched_labels, off, n, 1).reshape(b, h, w, a)
        pos = jax.lax.dynamic_slice_in_dim(
            m.positive, off, n, 1).reshape(b, h, w, a)
        neg = jax.lax.dynamic_slice_in_dim(
            m.negative, off, n, 1).reshape(b, h, w, a)
        weight = (pos | neg).astype(jnp.float32)
        # [B,H,W,A·K] → [B,H,W,A,K] is a contiguous (bitcast) split; the
        # focal custom-VJP sums over the trailing (A,K) into [B,H,W] —
        # reduce the spatial dims here
        cls_sum = cls_sum + jnp.sum(
            _focal_sum(cls4.reshape(b, h, w, a, k),
                       lab, weight, alpha, gamma), axis=(-2, -1))
        tgt = jax.lax.dynamic_slice_in_dim(
            reg_targets, off, n, 1).reshape(b, h, w, a * 4)
        diff = jnp.abs(box4.astype(jnp.float32) - tgt)
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta)
        wpos = jnp.repeat(pos.astype(jnp.float32), 4, axis=-1)
        reg_sum = reg_sum + jnp.sum(sl1 * wpos, axis=(1, 2, 3))
        off += n

    cls = cls_sum / num_pos_vec
    reg_den = jnp.maximum(
        jnp.sum(m.positive.astype(jnp.float32), axis=-1) * 4.0, 1.0)
    reg = reg_sum / reg_den
    metrics = {
        "num_pos": jnp.sum(m.positive.astype(jnp.float32)) / cls.shape[0],
        "cls_loss": jnp.mean(cls),
        "reg_loss": jnp.mean(reg),
    }
    return DetectionLossOutput(jnp.mean(cls), jnp.mean(reg), metrics)


def detection_loss(
    cls_logits: Array,  # [B, A, K]
    reg_preds: Array,  # [B, A, 4]
    anchors: Array,  # [A, 4]
    gt_boxes: Array,  # [B, G, 4]
    gt_labels: Array,  # [B, G] int32, -1 padding
    fg_iou_threshold: float = 0.5,
    bg_iou_threshold: float = 0.4,
    alpha: float = 0.25,
    gamma: float = 2.0,
    beta: float = 1.0 / 9.0,
    box_std: Sequence[float] = DEFAULT_BOX_STD,
) -> DetectionLossOutput:
    """End-to-end training loss: match → focal + smooth-L1, batched.

    This is the vectorized replacement for the whole reference
    ``FocalLoss(cls, reg, anchors, annot)`` call (SURVEY.md §3.1), one jit
    region, no host sync.
    """
    m: MatchResult = match_anchors(
        anchors, gt_boxes, gt_labels, fg_iou_threshold, bg_iou_threshold
    )
    cls = focal_loss(cls_logits, m.matched_labels, m.positive, m.negative,
                     alpha, gamma)  # [B]
    reg_targets = encode_boxes(m.matched_boxes, anchors[None, :, :], box_std)
    reg = smooth_l1_loss(reg_preds, reg_targets, m.positive, beta)  # [B]
    metrics = {
        "num_pos": jnp.sum(m.positive.astype(jnp.float32)) / cls.shape[0],
        "cls_loss": jnp.mean(cls),
        "reg_loss": jnp.mean(reg),
    }
    return DetectionLossOutput(jnp.mean(cls), jnp.mean(reg), metrics)
