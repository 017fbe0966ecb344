"""Golden-value tests for anchor generation (SURVEY.md §2 #6, §4.1)."""

import numpy as np

from detjax.ops.anchors import (
    AnchorConfig,
    anchors_for_shape,
    generate_cell_anchors,
    level_anchors,
    num_anchors,
)


def test_cell_anchors_golden():
    # base 32 (level 3), ratio 1.0, scale 1.0 → square 32×32 centered at 0
    a = generate_cell_anchors(32.0, scales=[1.0], ratios=[1.0])
    np.testing.assert_allclose(a, [[-16, -16, 16, 16]], atol=1e-5)


def test_cell_anchors_areas_and_ratios():
    cfg = AnchorConfig()
    base = 32.0
    a = generate_cell_anchors(base, cfg.scales, cfg.ratios)
    assert a.shape == (9, 4)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    # ratio-major, scale-minor: first 3 anchors have ratio 0.5 (h = w/2)
    np.testing.assert_allclose(h[:3] / w[:3], 0.5, rtol=1e-5)
    np.testing.assert_allclose(h[3:6] / w[3:6], 1.0, rtol=1e-5)
    np.testing.assert_allclose(h[6:9] / w[6:9], 2.0, rtol=1e-5)
    # area preserved per scale: (base * scale)^2
    for j, s in enumerate(cfg.scales):
        for r in range(3):
            np.testing.assert_allclose(
                w[r * 3 + j] * h[r * 3 + j], (base * s) ** 2, rtol=1e-5
            )
    # all centered at origin
    np.testing.assert_allclose(a[:, :2] + a[:, 2:], 0.0, atol=1e-4)


def test_level_anchor_grid_centers():
    cfg = AnchorConfig(scales=(1.0,), ratios=(1.0,))
    a = level_anchors(3, (64, 64), cfg)  # stride 8 → 8×8 grid
    assert a.shape == (64, 4)
    centers = (a[:, :2] + a[:, 2:]) / 2
    # first cell center at (4, 4); row-major: next is (12, 4)
    np.testing.assert_allclose(centers[0], [4, 4], atol=1e-5)
    np.testing.assert_allclose(centers[1], [12, 4], atol=1e-5)
    np.testing.assert_allclose(centers[8], [4, 12], atol=1e-5)


def test_total_count_640():
    cfg = AnchorConfig()
    a = anchors_for_shape((640, 640), cfg)
    # levels 3..7 → 80² + 40² + 20² + 10² + 5² = 8525 cells × 9
    assert a.shape == (8525 * 9, 4)
    assert num_anchors((640, 640), cfg) == 8525 * 9
    assert a.dtype == np.float32


def test_non_square_and_non_divisible():
    cfg = AnchorConfig()
    a = anchors_for_shape((512, 640), cfg)
    expected = sum(
        -(-512 // 2 ** l) * (-(-640 // 2 ** l)) * 9 for l in range(3, 8)
    )
    assert a.shape == (expected, 4)


def test_cache_returns_same_object():
    a1 = anchors_for_shape((640, 640))
    a2 = anchors_for_shape((640, 640))
    assert a1 is a2
