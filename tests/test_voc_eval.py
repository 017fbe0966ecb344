"""VOC-style evaluator golden tests (hand-computed APs)."""

import numpy as np
import pytest

from detjax.evaluation.voc import evaluate_voc


def test_perfect_detection_ap1():
    gts = {0: {"boxes": np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
               "labels": np.array([0, 1])}}
    dets = {0: {"boxes": np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 1])}}
    res = evaluate_voc(gts, dets, num_classes=2)
    assert res["mAP"] == pytest.approx(1.0)


def test_half_precision_case():
    # one GT, two detections of the class: TP at rank1, FP at rank2 → AP=1;
    # flip scores so the FP ranks first → AP = 0.5
    gts = {0: {"boxes": np.array([[10, 10, 50, 50]]), "labels": np.array([0])}}
    dets = {0: {"boxes": np.array([[10, 10, 50, 50], [200, 200, 240, 240]]),
                "scores": np.array([0.5, 0.9]),
                "labels": np.array([0, 0])}}
    res = evaluate_voc(gts, dets, num_classes=1)
    assert res["mAP"] == pytest.approx(0.5)


def test_duplicate_detection_is_fp():
    gts = {0: {"boxes": np.array([[10, 10, 50, 50]]), "labels": np.array([0])}}
    dets = {0: {"boxes": np.array([[10, 10, 50, 50], [11, 11, 51, 51]]),
                "scores": np.array([0.9, 0.8]),
                "labels": np.array([0, 0])}}
    res = evaluate_voc(gts, dets, num_classes=1)
    # second det overlaps an already-taken GT → FP; AP stays 1.0 (every-point)
    assert res["mAP"] == pytest.approx(1.0)
    assert res["AP/0"] == pytest.approx(1.0)


def test_missed_gt_reduces_recall():
    gts = {0: {"boxes": np.array([[10, 10, 50, 50], [100, 100, 150, 150]]),
               "labels": np.array([0, 0])}}
    dets = {0: {"boxes": np.array([[10, 10, 50, 50]]),
                "scores": np.array([0.9]), "labels": np.array([0])}}
    res = evaluate_voc(gts, dets, num_classes=1)
    assert res["mAP"] == pytest.approx(0.5)


def test_class_names_in_keys():
    gts = {0: {"boxes": np.array([[0, 0, 10, 10]]), "labels": np.array([0])}}
    dets = {0: {"boxes": np.array([[0, 0, 10, 10]]),
                "scores": np.array([1.0]), "labels": np.array([0])}}
    res = evaluate_voc(gts, dets, num_classes=1, class_names=["cat"])
    assert "AP/cat" in res
