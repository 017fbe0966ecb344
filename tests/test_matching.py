"""Matching / target-assignment tests, incl. torch differential."""

import numpy as np
import jax.numpy as jnp
import torch

from detjax.ops.matching import match_anchors
from tests.torch_ref.detection_math import match_t


def test_basic_assignment():
    anchors = jnp.array(
        [[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 9, 10], [50, 50, 52, 52]],
        dtype=jnp.float32,
    )
    gt_boxes = jnp.array([[[0, 0, 10, 10], [100, 100, 112, 112]]], dtype=jnp.float32)
    gt_labels = jnp.array([[3, 7]], dtype=jnp.int32)
    m = match_anchors(anchors, gt_boxes, gt_labels)
    assert m.positive.shape == (1, 4)
    pos = np.asarray(m.positive[0])
    labels = np.asarray(m.matched_labels[0])
    assert pos[0] and labels[0] == 3  # exact match
    assert pos[1] and labels[1] == 7  # IoU 100/144 ≈ 0.69
    assert pos[2] and labels[2] == 3  # IoU 0.9
    assert not pos[3] and np.asarray(m.negative[0])[3]  # no overlap → bg
    np.testing.assert_allclose(np.asarray(m.matched_boxes[0, 0]), [0, 0, 10, 10])


def test_ignore_zone():
    # IoU between 0.4 and 0.5 → neither positive nor negative
    anchors = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    # overlap 45/100... construct IoU = 45/(100+45-45)=0.45: gt [0,0,10,4.5]
    gt_boxes = jnp.array([[[0, 0, 10, 4.5]]], dtype=jnp.float32)
    gt_labels = jnp.array([[0]], dtype=jnp.int32)
    m = match_anchors(anchors, gt_boxes, gt_labels)
    assert not bool(m.positive[0, 0])
    assert not bool(m.negative[0, 0])


def test_padding_never_wins():
    anchors = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    # padded GT (label -1) has perfect IoU; valid GT has lower IoU
    gt_boxes = jnp.array([[[0, 0, 10, 10], [0, 0, 10, 8]]], dtype=jnp.float32)
    gt_labels = jnp.array([[-1, 5]], dtype=jnp.int32)
    m = match_anchors(anchors, gt_boxes, gt_labels)
    assert bool(m.positive[0, 0])
    assert int(m.matched_labels[0, 0]) == 5
    assert int(m.matched_gt[0, 0]) == 1


def test_no_gt_all_negative():
    anchors = jnp.array([[0, 0, 10, 10], [5, 5, 20, 20]], dtype=jnp.float32)
    gt_boxes = jnp.zeros((1, 3, 4), dtype=jnp.float32)
    gt_labels = jnp.full((1, 3), -1, dtype=jnp.int32)
    m = match_anchors(anchors, gt_boxes, gt_labels)
    assert not np.asarray(m.positive).any()
    assert np.asarray(m.negative).all()


def test_vs_torch(rng):
    anchors = rng.uniform(0, 200, (200, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(5, 80, (200, 2))
    gt = rng.uniform(0, 200, (8, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + rng.uniform(10, 100, (8, 2))
    labels = rng.integers(0, 80, (8,)).astype(np.int32)
    labels[-2:] = -1  # padding
    m = match_anchors(jnp.asarray(anchors), jnp.asarray(gt[None]),
                      jnp.asarray(labels[None]))
    t_labels, t_boxes, t_pos, t_neg = match_t(
        torch.from_numpy(anchors), torch.from_numpy(gt),
        torch.from_numpy(labels).long())
    np.testing.assert_array_equal(np.asarray(m.positive[0]), t_pos.numpy())
    np.testing.assert_array_equal(np.asarray(m.negative[0]), t_neg.numpy())
    np.testing.assert_array_equal(np.asarray(m.matched_labels[0]),
                                  t_labels.numpy().astype(np.int32))
    np.testing.assert_allclose(np.asarray(m.matched_boxes[0]),
                               t_boxes.numpy(), atol=1e-5)
