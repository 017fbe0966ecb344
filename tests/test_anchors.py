"""Golden-value tests for anchor generation (SURVEY.md §2 #6, §4.1)."""

import numpy as np
import pytest

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


def test_per_level_sizes_override_stride_rule():
    """SSD-style anchors: absolute per-level sizes, not stride-proportional
    (SURVEY.md §2 #5; VERDICT round-1 weak #3)."""
    cfg = AnchorConfig(min_level=3, max_level=4, ratios=(1.0,),
                       per_level_sizes=((20.0,), (30.0,)))
    a3 = level_anchors(3, (64, 64), cfg)
    a4 = level_anchors(4, (64, 64), cfg)
    # first anchor is centered at (stride/2, stride/2) with the given size
    np.testing.assert_allclose(a3[0], [4 - 10, 4 - 10, 4 + 10, 4 + 10])
    np.testing.assert_allclose(a4[0], [8 - 15, 8 - 15, 8 + 15, 8 + 15])
    assert cfg.num_per_cell == 1


def test_ssd_preset_anchors_differ_from_retinanet():
    from detjax.config import get_config
    from detjax.modeling import anchor_config

    ssd = anchor_config(get_config("ssd_512"))
    retina = anchor_config(get_config("retinanet_r50_640"))
    assert ssd.per_level_sizes and not retina.per_level_sizes
    assert ssd.num_per_cell == 6
    # SSD scale rule: smallest size = 0.1 * 512 at P3; largest = 0.9 * 512
    assert ssd.per_level_sizes[0][0] == pytest.approx(51.2)
    assert ssd.per_level_sizes[-1][0] == pytest.approx(460.8)
    a = anchors_for_shape((512, 512), ssd)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    assert np.sqrt(w * h).min() == pytest.approx(51.2, rel=1e-5)
