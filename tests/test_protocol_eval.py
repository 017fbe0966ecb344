"""Variable-geometry protocol evaluator tests (SURVEY.md §2 #14, §3.2).

Three claims, each pinned:
  * geometry — ``protocol_canvas`` / ``letterbox_protocol`` reproduce the
    reference Resizer (torch replica ``resize_protocol_t``) BYTE-exactly
    on COCO-typical mixed shapes, including the pad-rounding corner where
    the canvas is looser than the content;
  * plumbing — the bucketed evaluator's batching / partial-batch padding /
    per-image scale un-mapping yields exactly what direct dispatch of the
    same canvases through the same engine yields;
  * protocol — the default (608, 1024) bucket family is the finite set
    the design note claims (short side 608 or pad-rounded below).
"""

import dataclasses

import numpy as np
import pytest

import jax

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset
from detjax.data.transforms import (
    letterbox_protocol,
    protocol_canvas,
    protocol_scale,
)
from detjax.evaluation.protocol import (
    bucket_by_canvas,
    image_sizes,
    iter_detections_protocol,
    run_coco_eval_protocol,
)
from detjax.modeling import build_model

# COCO-typical val2017 shapes + stress corners (tiny, huge-aspect, exact)
MIXED_SHAPES = ((640, 480), (480, 640), (500, 375), (427, 640), (612, 612),
                (640, 426), (333, 500), (240, 320), (1024, 768), (96, 2000))


@pytest.mark.parametrize("hw", MIXED_SHAPES)
def test_canvas_matches_reference_resizer(hw, rng):
    """Canvas geometry AND pixels byte-equal the torch replica's Resizer."""
    from tests.torch_ref.eval_branch import resize_protocol_t

    img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    ref_canvas, ref_scale = resize_protocol_t(img)
    (ph, pw), scale = protocol_canvas(*hw)
    assert (ph, pw) == ref_canvas.shape[:2]
    assert scale == pytest.approx(ref_scale, abs=0)
    canvas, _, s2 = letterbox_protocol(
        img, np.zeros((0, 4), np.float32), (ph, pw))
    assert s2 == scale
    np.testing.assert_array_equal(canvas, ref_canvas)


def test_protocol_scale_not_canvas_fit():
    """Pad-rounding can make the canvas looser than the content; the
    content size must still be the reference's round(h*s) × round(w*s),
    NOT re-derived from the canvas."""
    h, w = 427, 640
    (ph, pw), s = protocol_canvas(h, w)
    nh, nw = int(round(h * s)), int(round(w * s))
    assert (ph, pw) != (nh, nw)  # pad ring exists
    img = np.full((h, w, 3), 200, np.uint8)
    canvas, _, _ = letterbox_protocol(img, np.zeros((0, 4), np.float32),
                                      (ph, pw))
    # content occupies exactly [:nh, :nw]; pad is zeros
    assert canvas[nh - 1, nw - 1].sum() > 0
    assert canvas[nh:, :].sum() == 0 and canvas[:, nw:].sum() == 0


def test_bucket_family_is_finite():
    """Default protocol: short canvas side ∈ {608} ∪ pad-rounded-below
    (long-side-capped images), long side ≤ 1024."""
    rng = np.random.default_rng(0)
    shapes = [(int(h), int(w)) for h, w in
              zip(rng.integers(50, 2000, 500), rng.integers(50, 2000, 500))]
    buckets = bucket_by_canvas(shapes, 608, 1024)
    for (ph, pw) in buckets:
        assert min(ph, pw) <= 608 and max(ph, pw) <= 1024
        assert ph % 32 == 0 and pw % 32 == 0
    # square-ish images all land on the SAME canvas — the finite-family
    # property that makes per-bucket compilation viable
    sq = bucket_by_canvas([(500, 500), (613, 613), (1000, 1000)], 608, 1024)
    assert list(sq) == [(608, 608)]


def test_image_sizes_from_coco_metadata(tmp_path):
    """CocoDataset sizes come from the annotation JSON — no decode."""
    import json

    from detjax.data import CocoDataset

    ann = {"images": [{"id": 7, "height": 480, "width": 640,
                       "file_name": "missing.jpg"},
                      {"id": 9, "height": 375, "width": 500,
                       "file_name": "missing2.jpg"}],
           "annotations": [], "categories": [{"id": 1, "name": "c"}]}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = CocoDataset(str(p), image_dir=str(tmp_path))  # images absent
    assert image_sizes(ds) == [(480, 640), (375, 500)]


def test_mixed_size_synthetic_dataset():
    ds = SyntheticDetectionDataset(
        num_images=4, num_classes=3, max_objects=2, seed=5,
        image_sizes=((96, 128), (128, 96)))
    assert ds[0]["image"].shape == (96, 128, 3)
    assert ds[1]["image"].shape == (128, 96, 3)
    assert ds[2]["size"] == (96, 128)
    assert image_sizes(ds) == [(96, 128), (128, 96), (96, 128), (128, 96)]


@pytest.fixture(scope="module")
def proto_setup():
    """Tiny depth-18 detector + mixed-geometry dataset with a small
    protocol (min 64 / max 128) so CPU compiles stay cheap: canvases
    64x96, 96x64 and 64x128 — three buckets, one with a partial batch."""
    cfg = get_config("retinanet_r50_640", **{
        "model.backbone_depth": 18,
        "model.image_size": (64, 64),
        "model.num_classes": 4,
        "train.max_gt": 4,
        "eval.batch_size": 2,
        "data.eval_scale_minmax": (64, 128),
    })
    _, variables = build_model(cfg, jax.random.PRNGKey(0))
    ds = SyntheticDetectionDataset(
        num_images=7, num_classes=4, max_objects=2, seed=2,
        image_sizes=((96, 144), (144, 96), (80, 160)))
    return cfg, variables, ds


def test_protocol_eval_equals_direct_dispatch(proto_setup):
    """The bucketed path (batching, partial-batch padding, /scale
    un-mapping) is byte-exact vs dispatching the SAME canvases directly
    through the same per-bucket engine."""
    from detjax.modeling import _detect_u8_fn

    cfg, variables, ds = proto_setup
    minmax = tuple(cfg.data.eval_scale_minmax)
    got = {img_id: (b, s, l) for img_id, b, s, l in
           iter_detections_protocol(variables, ds, cfg)}
    assert sorted(got) == list(range(7))

    buckets = bucket_by_canvas(image_sizes(ds), *minmax)
    assert len(buckets) >= 2  # the set genuinely exercises multi-bucket
    bs = cfg.eval.batch_size
    for hw, idxs in buckets.items():
        bcfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, image_size=hw))
        detect = _detect_u8_fn(bcfg)
        for start in range(0, len(idxs), bs):
            chunk = idxs[start:start + bs]
            canv, scales = [], []
            for i in chunk:
                rec = ds[i]
                c, _, s = letterbox_protocol(rec["image"], rec["boxes"],
                                             hw, *minmax)
                canv.append(c)
                scales.append(s)
            while len(canv) < bs:
                canv.append(canv[-1])
                scales.append(1.0)
            det = detect(variables, np.stack(canv))
            for j, i in enumerate(chunk):
                nv = int(np.asarray(det.num_valid)[j])
                b, s, l = got[ds[i]["image_id"]]
                np.testing.assert_array_equal(
                    b, np.asarray(det.boxes)[j, :nv] / scales[j])
                np.testing.assert_array_equal(
                    s, np.asarray(det.scores)[j, :nv])
                np.testing.assert_array_equal(
                    l, np.asarray(det.labels)[j, :nv])


def test_protocol_eval_boxes_in_original_coords(proto_setup):
    cfg, variables, ds = proto_setup
    for img_id, boxes, scores, labels in iter_detections_protocol(
            variables, ds, cfg):
        h, w = image_sizes(ds)[img_id]
        if len(boxes):
            # canvas clip / protocol scale ⇒ within the ORIGINAL frame
            # (up to the pad ring mapped back: canvas_w/scale ≥ w)
            assert boxes[:, 0::2].max() <= w * 1.5 + 1
            assert boxes.min() >= 0.0


def test_run_coco_eval_protocol_structure(proto_setup):
    cfg, variables, ds = proto_setup
    res = run_coco_eval_protocol(variables, ds, cfg, verbose=True)
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
              "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"):
        assert k in res.stats
    assert -1.0 <= res.stats["AP"] <= 1.0

    # max_images truncation: only the first N images are evaluated
    seen = [i for i, *_ in iter_detections_protocol(
        variables, ds, cfg, max_images=3)]
    assert sorted(seen) == [0, 1, 2]


def test_detect_fn_for_override(proto_setup):
    """Per-bucket engine injection (the int8 PTQ hook) sees every bucket
    config exactly once."""
    from detjax.modeling import _detect_u8_fn

    cfg, variables, ds = proto_setup
    seen = []

    def factory(bcfg):
        seen.append(bcfg.model.image_size)
        return _detect_u8_fn(bcfg)

    n = sum(1 for _ in iter_detections_protocol(
        variables, ds, cfg, detect_fn_for=factory))
    assert n == 7
    assert len(seen) == len(set(seen)) == len(
        bucket_by_canvas(image_sizes(ds),
                         *cfg.data.eval_scale_minmax))
