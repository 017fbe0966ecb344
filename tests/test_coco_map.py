"""Hand-computed golden tests for the COCOeval-compatible mAP evaluator
(SURVEY.md §4.6 "tiny synthetic COCO where expected mAP is exactly
computable")."""

import numpy as np

from detjax.evaluation.coco_map import (
    COCOMetric,
    GroundTruth,
    evaluate_detections,
)


def _det(boxes, scores, labels):
    return {
        "boxes": np.asarray(boxes, dtype=np.float64).reshape(-1, 4),
        "scores": np.asarray(scores, dtype=np.float64).reshape(-1),
        "labels": np.asarray(labels, dtype=np.int64).reshape(-1),
    }


def test_perfect_detections():
    gts = {0: GroundTruth(boxes=[[10, 10, 50, 50], [100, 100, 200, 200]],
                          labels=[0, 1])}
    dets = {0: _det([[10, 10, 50, 50], [100, 100, 200, 200]], [0.9, 0.8], [0, 1])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["AP"], 1.0)
    assert np.isclose(r["AP50"], 1.0)
    assert np.isclose(r["AP75"], 1.0)
    assert np.isclose(r["AR100"], 1.0)


def test_no_detections():
    gts = {0: GroundTruth(boxes=[[10, 10, 50, 50]], labels=[0])}
    r = evaluate_detections(gts, {})
    assert np.isclose(r["AP"], 0.0)
    assert np.isclose(r["AR100"], 0.0)


def test_iou_ladder():
    # det IoU with GT = 0.62 → TP at thresholds 0.50/0.55/0.60 only → AP = 0.3
    gts = {0: GroundTruth(boxes=[[0, 0, 100, 100]], labels=[0])}
    dets = {0: _det([[0, 0, 100, 62]], [0.9], [0])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["AP"], 0.3)
    assert np.isclose(r["AP50"], 1.0)
    assert np.isclose(r["AP75"], 0.0)


def test_half_recall():
    # 2 GTs, 1 perfect det → precision 1 up to recall 0.5 → AP = 51/101
    gts = {0: GroundTruth(boxes=[[0, 0, 50, 50], [100, 100, 160, 160]],
                          labels=[0, 0])}
    dets = {0: _det([[0, 0, 50, 50]], [0.9], [0])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["AP"], 51 / 101)
    assert np.isclose(r["AR100"], 0.5)


def test_fp_before_tp():
    # higher-scored FP then TP: envelope precision = 0.5 at every recall point
    gts = {0: GroundTruth(boxes=[[0, 0, 50, 50]], labels=[0])}
    dets = {0: _det([[500, 500, 550, 550], [0, 0, 50, 50]], [0.9, 0.8], [0, 0])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["AP"], 0.5)


def test_duplicate_detection_is_fp():
    # two dets on one GT: 2nd is FP → rc=[1,1], pr=[1,0.5] → AP=1 envelope?
    # envelope: pr[1]=0.5 ≤ pr[0]=1 stays; searchsorted(rc,thr,left): r=0→idx0
    # (pr 1.0), r∈(0,1]→idx0 ... rc=[1,1]: searchsorted left of 0.01 → 0 → 1.0
    # → AP = 1.0 (standard COCO behavior: duplicate after full recall doesn't hurt)
    gts = {0: GroundTruth(boxes=[[0, 0, 50, 50]], labels=[0])}
    dets = {0: _det([[0, 0, 50, 50], [1, 1, 51, 51]], [0.9, 0.8], [0, 0])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["AP"], 1.0)


def test_crowd_gt_ignored_not_fn_and_absorbs_dets():
    gts = {0: GroundTruth(
        boxes=[[0, 0, 50, 50], [100, 100, 300, 300]],
        labels=[0, 0],
        iscrowd=[False, True])}
    # det 1 hits the normal GT; det 2 lands inside the crowd region
    dets = {0: _det([[0, 0, 50, 50], [120, 120, 180, 180]], [0.9, 0.8], [0, 0])}
    r = evaluate_detections(gts, dets)
    # crowd is not a FN and the crowd-matched det is ignored → perfect score
    assert np.isclose(r["AP"], 1.0)


def test_area_ranges():
    # one small GT (20×20=400 < 32²) detected perfectly
    gts = {0: GroundTruth(boxes=[[0, 0, 20, 20]], labels=[0])}
    dets = {0: _det([[0, 0, 20, 20]], [0.9], [0])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["APs"], 1.0)
    assert r["APm"] == -1.0  # no medium GTs → undefined
    assert r["APl"] == -1.0
    assert np.isclose(r["AP"], 1.0)


def test_maxdets_ar():
    gts = {0: GroundTruth(boxes=[[0, 0, 50, 50], [100, 100, 160, 160]],
                          labels=[0, 0])}
    dets = {0: _det([[0, 0, 50, 50], [100, 100, 160, 160]], [0.9, 0.8], [0, 0])}
    r = evaluate_detections(gts, dets)
    assert np.isclose(r["AR1"], 0.5)  # only top-1 det considered
    assert np.isclose(r["AR10"], 1.0)


def test_multi_image_multi_class():
    gts = {
        0: GroundTruth(boxes=[[0, 0, 50, 50]], labels=[0]),
        1: GroundTruth(boxes=[[0, 0, 50, 50], [60, 60, 120, 120]], labels=[1, 1]),
    }
    dets = {
        0: _det([[0, 0, 50, 50]], [0.9], [0]),  # class 0: perfect
        1: _det([[0, 0, 50, 50]], [0.8], [1]),  # class 1: half recall
    }
    r = evaluate_detections(gts, dets, category_ids=[0, 1])
    want = (1.0 + 51 / 101) / 2
    assert np.isclose(r["AP"], want)
    assert np.isclose(r.per_class_ap[0], 1.0)
    assert np.isclose(r.per_class_ap[1], 51 / 101)


def test_score_ordering_across_images():
    # FP with higher score in image 1 must rank before TP in image 0
    gts = {
        0: GroundTruth(boxes=[[0, 0, 50, 50]], labels=[0]),
        1: GroundTruth(boxes=np.zeros((0, 4)), labels=np.zeros((0,))),
    }
    dets = {
        0: _det([[0, 0, 50, 50]], [0.5], [0]),
        1: _det([[0, 0, 50, 50]], [0.9], [0]),  # FP, outranks the TP
    }
    r = evaluate_detections(gts, dets, category_ids=[0])
    assert np.isclose(r["AP"], 0.5)


def test_streaming_metric_matches_direct():
    m = COCOMetric(category_ids=[0, 1])
    gt0 = GroundTruth(boxes=[[0, 0, 50, 50]], labels=[0])
    boxes = np.array([[0, 0, 50, 50], [0, 0, 0, 0]])
    scores = np.array([0.9, 0.0])
    labels = np.array([0, -1])  # padded slot dropped
    m.add(0, gt0, boxes, scores, labels)
    r = m.compute()
    assert np.isclose(r["AP"], 1.0)
