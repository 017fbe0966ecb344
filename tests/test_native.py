"""Native C++ layer tests: the ctypes kernels must reproduce the numpy
reference implementations exactly (matching/IoU) or to rounding (resize).
Skipped wholesale if no g++ toolchain is available."""

import numpy as np
import pytest

from detjax import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _rand_boxes(rng, n, size=200.0):
    cxcy = rng.uniform(10, size - 10, (n, 2))
    wh = rng.uniform(2, 80, (n, 2))
    return np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)


def test_native_iou_matches_numpy(rng, monkeypatch):
    monkeypatch.setenv("DETJAX_NATIVE", "0")  # force numpy reference
    from detjax.evaluation.coco_map import _iou_xyxy

    det = _rand_boxes(rng, 37)
    gt = _rand_boxes(rng, 11)
    crowd = rng.random(11) < 0.3
    want = _iou_xyxy(det, gt, crowd)
    got = native.iou_xyxy(det, gt, crowd)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_native_match_matches_numpy(rng, monkeypatch):
    from detjax.evaluation import coco_map
    from detjax.evaluation.coco_map import GroundTruth, _evaluate_img

    for trial in range(20):
        d_n = int(rng.integers(0, 25))
        g_n = int(rng.integers(0, 12))
        det = _rand_boxes(rng, d_n)
        det_areas = np.maximum(det[:, 2] - det[:, 0], 0) * np.maximum(
            det[:, 3] - det[:, 1], 0)
        gt = GroundTruth(boxes=_rand_boxes(rng, g_n),
                         labels=np.zeros(g_n, np.int64),
                         iscrowd=rng.random(g_n) < 0.25)
        sel = np.arange(g_n)
        area_rng = (0.0, 1e10) if trial % 2 == 0 else (500.0, 5000.0)
        ious = coco_map._iou_xyxy(det, gt.boxes, gt.iscrowd)

        monkeypatch.setenv("DETJAX_NATIVE", "0")
        w_dtm, w_ig, w_gt_ig = _evaluate_img(det, det_areas, gt, sel,
                                             area_rng, ious.copy())
        monkeypatch.setenv("DETJAX_NATIVE", "1")
        g_dtm, g_ig, g_gt_ig = _evaluate_img(det, det_areas, gt, sel,
                                             area_rng, ious.copy())
        np.testing.assert_array_equal(g_dtm, w_dtm)
        np.testing.assert_array_equal(g_ig, w_ig)
        np.testing.assert_array_equal(g_gt_ig, w_gt_ig)


def test_native_full_map_equals_numpy(rng, monkeypatch):
    """End-to-end evaluate_detections must give identical stats."""
    from detjax.evaluation.coco_map import GroundTruth, evaluate_detections

    gts, dets = {}, {}
    for img in range(6):
        g = int(rng.integers(1, 6))
        gts[img] = GroundTruth(boxes=_rand_boxes(rng, g),
                               labels=rng.integers(0, 3, g))
        d = int(rng.integers(0, 10))
        dets[img] = {"boxes": _rand_boxes(rng, d),
                     "scores": rng.random(d),
                     "labels": rng.integers(0, 3, d)}
    monkeypatch.setenv("DETJAX_NATIVE", "0")
    want = evaluate_detections(gts, dets)
    monkeypatch.setenv("DETJAX_NATIVE", "1")
    got = evaluate_detections(gts, dets)
    for k, v in want.stats.items():
        assert got.stats[k] == pytest.approx(v, abs=1e-12), k


def test_native_resize_bit_identical_to_pil(rng):
    """The native resize IS Pillow's BILINEAR resample, per bit — the
    separable triangle filter with antialiased downscale and Pillow's
    8bpc fixed-point arithmetic. Bit-identity means a dataset pipelined
    through the native loader and one through PIL produce byte-equal
    canvases (the torchref two-stack mAP gate depends on this: its torch
    replica resizes with PIL, detjax with the native kernel)."""
    from PIL import Image

    out = native.resize_bilinear(
        rng.integers(0, 255, (64, 48, 3)).astype(np.uint8), 128, 96)
    assert out.shape == (128, 96, 3)
    # constant image stays constant (coeffs normalize to 1)
    flat = np.full((33, 17, 3), 77, np.uint8)
    np.testing.assert_array_equal(native.resize_bilinear(flat, 50, 41), 77)
    # bit-identity sweep: downscale / upscale / mixed / identity-adjacent,
    # 1- and 3-channel, including the eval-protocol 640->608 shape
    cases = [((640, 640, 3), 608, 608), ((64, 48, 3), 128, 96),
             ((128, 96, 3), 64, 48), ((100, 30, 1), 31, 99),
             ((5, 200, 3), 200, 5), ((97, 97, 3), 96, 98)]
    for (h, w, c), dh, dw in cases:
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        pil_src = Image.fromarray(img[..., 0] if c == 1 else img)
        want = np.asarray(pil_src.resize((dw, dh), Image.BILINEAR))
        if c == 1:
            want = want[..., None]
        got = native.resize_bilinear(img, dh, dw)
        np.testing.assert_array_equal(got, want, err_msg=f"{(h, w, c)}->{(dh, dw)}")
