"""Focal / smooth-L1 loss tests: hand-computed golden values + torch diff."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from detjax.ops.boxes import encode_boxes
from detjax.ops.losses import focal_loss, smooth_l1_loss, detection_loss
from detjax.ops.matching import match_anchors
from tests.torch_ref.detection_math import (
    match_t, focal_t, encode_t, smooth_l1_t,
)


def test_focal_golden_single_anchor():
    # one anchor, one class, positive with logit 0 → p = 0.5
    # loss = alpha * (1-p)^gamma * -log(p) = 0.25 * 0.25 * log(2)
    logits = jnp.zeros((1, 1, 1))
    labels = jnp.zeros((1, 1), dtype=jnp.int32)
    pos = jnp.ones((1, 1), dtype=bool)
    neg = jnp.zeros((1, 1), dtype=bool)
    out = float(focal_loss(logits, labels, pos, neg)[0])
    np.testing.assert_allclose(out, 0.25 * 0.25 * np.log(2), rtol=1e-6)


def test_focal_golden_negative_anchor():
    # background anchor, logit 0: loss = (1-alpha) * p^gamma * -log(1-p)
    logits = jnp.zeros((1, 1, 1))
    labels = jnp.full((1, 1), -1, dtype=jnp.int32)
    pos = jnp.zeros((1, 1), dtype=bool)
    neg = jnp.ones((1, 1), dtype=bool)
    out = float(focal_loss(logits, labels, pos, neg)[0])
    np.testing.assert_allclose(out, 0.75 * 0.25 * np.log(2), rtol=1e-6)


def test_focal_ignore_contributes_zero():
    logits = jnp.full((1, 2, 3), 2.5)
    labels = jnp.array([[1, -1]], dtype=jnp.int32)
    pos = jnp.array([[True, False]])
    neg = jnp.array([[False, False]])  # anchor 1 ignored
    with_ignore = float(focal_loss(logits, labels, pos, neg)[0])
    only_first = float(
        focal_loss(logits[:, :1], labels[:, :1], pos[:, :1],
                   jnp.zeros((1, 1), bool))[0]
    )
    np.testing.assert_allclose(with_ignore, only_first, rtol=1e-6)


def test_smooth_l1_golden():
    beta = 1.0 / 9.0
    # diff 0.05 < beta → 0.5 * diff² / beta ; diff 1.0 → 1 - beta/2
    reg = jnp.array([[[0.05, 1.0, 0.0, 0.0]]])
    tgt = jnp.zeros((1, 1, 4))
    pos = jnp.ones((1, 1), bool)
    out = float(smooth_l1_loss(reg, tgt, pos, beta)[0])
    want = (0.5 * 0.05 ** 2 / beta + (1.0 - beta / 2)) / 4.0
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_smooth_l1_no_positives_is_zero():
    reg = jnp.ones((1, 5, 4))
    tgt = jnp.zeros((1, 5, 4))
    pos = jnp.zeros((1, 5), bool)
    assert float(smooth_l1_loss(reg, tgt, pos)[0]) == 0.0


def _random_scene(rng, a=300, g=10, k=20):
    anchors = rng.uniform(0, 300, (a, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(8, 120, (a, 2))
    gt = rng.uniform(0, 300, (g, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + rng.uniform(16, 150, (g, 2))
    labels = rng.integers(0, k, (g,)).astype(np.int32)
    labels[-3:] = -1
    logits = rng.normal(0, 1, (a, k)).astype(np.float32)
    reg = rng.normal(0, 0.5, (a, 4)).astype(np.float32)
    return anchors, gt, labels, logits, reg


def test_full_loss_vs_torch(rng):
    anchors, gt, labels, logits, reg = _random_scene(rng)
    out = detection_loss(
        jnp.asarray(logits[None]), jnp.asarray(reg[None]), jnp.asarray(anchors),
        jnp.asarray(gt[None]), jnp.asarray(labels[None]))
    ta = torch.from_numpy(anchors)
    t_labels, t_boxes, t_pos, t_neg = match_t(
        ta, torch.from_numpy(gt), torch.from_numpy(labels).long())
    t_cls = focal_t(torch.from_numpy(logits), t_labels, t_pos, t_neg)
    t_tgt = encode_t(t_boxes, ta)
    t_reg = smooth_l1_t(torch.from_numpy(reg), t_tgt, t_pos)
    np.testing.assert_allclose(float(out.cls_loss), float(t_cls), rtol=1e-4)
    np.testing.assert_allclose(float(out.reg_loss), float(t_reg), rtol=1e-4)


def test_loss_is_differentiable_and_finite(rng):
    anchors, gt, labels, logits, reg = _random_scene(rng, a=100, g=5, k=8)

    def loss_fn(lg, rg):
        out = detection_loss(lg[None], rg[None], jnp.asarray(anchors),
                             jnp.asarray(gt[None]), jnp.asarray(labels[None]))
        return out.cls_loss + out.reg_loss

    g1, g2 = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(reg))
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    assert np.abs(np.asarray(g1)).sum() > 0


def test_loss_jits_without_retrace(rng):
    import chex
    anchors, gt, labels, logits, reg = _random_scene(rng, a=100, g=5, k=8)

    @jax.jit
    @chex.assert_max_traces(n=1)
    def f(lg, rg, gb, gl):
        out = detection_loss(lg, rg, jnp.asarray(anchors), gb, gl)
        return out.cls_loss + out.reg_loss

    for _ in range(3):
        v = f(jnp.asarray(logits[None]), jnp.asarray(reg[None]),
              jnp.asarray(gt[None]), jnp.asarray(labels[None]))
    assert np.isfinite(float(v))


def test_focal_custom_vjp_matches_autodiff_gradient(rng):
    """The analytic focal backward (ops/losses._focal_sum) must match
    jax.grad of the reference elementwise formulation."""
    import jax
    import jax.numpy as jnp
    from detjax.ops.losses import _focal_elem, _focal_sum

    b, a, k = 2, 64, 7
    logits = jnp.asarray(rng.normal(-1, 2, (b, a, k)), jnp.float32)
    labels = jnp.asarray(
        np.where(rng.random((b, a)) < 0.2, rng.integers(0, k, (b, a)), -1),
        jnp.int32)
    weight = jnp.asarray(rng.random((b, a)) < 0.9, jnp.float32)

    for gamma in (2.0, 1.0, 1.7):
        ref = jax.grad(
            lambda x: jnp.sum(_focal_elem(x, labels, weight, 0.25, gamma)))(
                logits)
        got = jax.grad(
            lambda x: jnp.sum(_focal_sum(x, labels, weight, 0.25, gamma)))(
                logits)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
    # bf16 logits: gradient dtype follows input dtype like autodiff does
    g16 = jax.grad(lambda x: jnp.sum(
        _focal_sum(x, labels, weight, 0.25, 2.0)))(logits.astype(jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16


def test_detection_loss_per_level_matches_flat(rng):
    """detection_loss_per_level (conv-native layouts) must equal the
    flattened-path detection_loss bit-for-bit-ish on the same outputs."""
    import jax.numpy as jnp
    from detjax.ops.anchors import AnchorConfig, anchors_for_shape, anchors_per_level
    from detjax.ops.losses import detection_loss, detection_loss_per_level

    acfg = AnchorConfig(min_level=3, max_level=5)
    image = (64, 64)
    anchors = jnp.asarray(anchors_for_shape(image, acfg))
    per = anchors_per_level(image, acfg)
    sizes = {l: a.shape[0] for l, a in per.items()}
    b, k, a_cell = 2, 5, acfg.num_per_cell
    outputs, cls_flat, box_flat = {}, [], []
    for l in sorted(per):
        stride = 2 ** l
        h = w = -(-image[0] // stride)
        cls4 = jnp.asarray(rng.normal(-2, 1, (b, h, w, a_cell * k)),
                           jnp.float32)
        box4 = jnp.asarray(rng.normal(0, 0.2, (b, h, w, a_cell * 4)),
                           jnp.float32)
        outputs[l] = (cls4, box4)
        cls_flat.append(cls4.reshape(b, h * w * a_cell, k))
        box_flat.append(box4.reshape(b, h * w * a_cell, 4))
    gt_boxes = jnp.asarray([[[4, 4, 30, 30], [20, 20, 60, 60]]] * b,
                           jnp.float32)
    gt_labels = jnp.asarray([[1, 3]] * b, jnp.int32)

    flat = detection_loss(jnp.concatenate(cls_flat, 1),
                          jnp.concatenate(box_flat, 1),
                          anchors, gt_boxes, gt_labels)
    lvl = detection_loss_per_level(outputs, anchors, sizes,
                                   gt_boxes, gt_labels)
    np.testing.assert_allclose(float(lvl.cls_loss), float(flat.cls_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(lvl.reg_loss), float(flat.reg_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(lvl.metrics["num_pos"]),
                               float(flat.metrics["num_pos"]))
