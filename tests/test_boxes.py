"""IoU / encode / decode / clip tests, incl. numpy + torch differentials."""

import numpy as np
import jax.numpy as jnp
import torch

from detjax.ops.boxes import box_iou, encode_boxes, decode_boxes, clip_boxes
from tests.np_ref import iou_np, encode_np, decode_np
from tests.torch_ref.detection_math import decode_t, encode_t


def test_iou_golden():
    a = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                  dtype=jnp.float32)
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def test_iou_vs_numpy(rng):
    a = rng.uniform(0, 100, (40, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (30, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = iou_np(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_batched(rng):
    a = rng.uniform(0, 50, (2, 5, 4)).astype(np.float32)
    b = rng.uniform(0, 50, (2, 7, 4)).astype(np.float32)
    for x in (a, b):
        x[..., 2:] = x[..., :2] + np.abs(x[..., 2:] - x[..., :2])
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (2, 5, 7)
    for i in range(2):
        np.testing.assert_allclose(got[i], iou_np(a[i], b[i]), atol=1e-5)


def _random_boxes(rng, n):
    xy = rng.uniform(0, 500, (n, 2))
    wh = rng.uniform(2, 200, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def test_encode_decode_roundtrip(rng):
    anchors = _random_boxes(rng, 64)
    gt = _random_boxes(rng, 64)
    deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    back = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-2)


def test_encode_vs_numpy_and_torch(rng):
    anchors = _random_boxes(rng, 32)
    gt = _random_boxes(rng, 32)
    got = np.asarray(encode_boxes(jnp.asarray(gt), jnp.asarray(anchors)))
    # numpy oracle runs in float64; ours is fp32 → ulp-level drift
    np.testing.assert_allclose(got, encode_np(gt, anchors), rtol=1e-3, atol=1e-3)
    tref = encode_t(torch.from_numpy(gt), torch.from_numpy(anchors)).numpy()
    # XLA rewrites /const as *reciprocal and its log() differs from torch's
    # by a few ulp — both amplified by the 1/0.1 std scaling.
    np.testing.assert_allclose(got, tref, rtol=1e-3, atol=1e-3)


def test_decode_vs_numpy_and_torch(rng):
    anchors = _random_boxes(rng, 32)
    deltas = rng.normal(0, 1, (32, 4)).astype(np.float32)
    got = np.asarray(decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, decode_np(deltas, anchors), rtol=1e-3, atol=1e-3)
    tref = decode_t(torch.from_numpy(deltas), torch.from_numpy(anchors)).numpy()
    np.testing.assert_allclose(got, tref, rtol=1e-5, atol=1e-3)


def test_clip():
    boxes = jnp.array([[-5, -5, 700, 300], [10, 20, 30, 40]], dtype=jnp.float32)
    out = np.asarray(clip_boxes(boxes, (480, 640)))
    np.testing.assert_allclose(out, [[0, 0, 640, 300], [10, 20, 30, 40]])


def test_decode_clip_boxes_fused_matches_composition():
    """decode_clip_boxes (public BBoxTransform→ClipBoxes composition; Pallas
    on TPU, jnp elsewhere) == clip(decode(...)) on every backend."""
    import numpy as np
    import jax.numpy as jnp
    from detjax.ops.boxes import clip_boxes, decode_boxes, decode_clip_boxes

    rng = np.random.default_rng(7)
    a = 300
    anchors = np.stack([rng.uniform(0, 600, a), rng.uniform(0, 600, a)], -1)
    anchors = np.concatenate(
        [anchors, anchors + rng.uniform(8, 60, (a, 2))], -1).astype(np.float32)
    deltas = rng.normal(0, 1, (2, a, 4)).astype(np.float32)

    want = clip_boxes(
        decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)), (640, 640))
    got = decode_clip_boxes(jnp.asarray(deltas), jnp.asarray(anchors),
                            (640, 640))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
