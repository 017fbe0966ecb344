"""End-to-end evaluator loop tests: batched fused detect over a dataset →
COCO stats / VOC AP, with letterbox scale un-mapping (SURVEY.md §3.3)."""

import numpy as np
import pytest

import jax

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset
from detjax.evaluation.evaluator import (
    iter_detections,
    run_coco_eval,
    run_voc_eval,
)
from detjax.modeling import build_model


@pytest.fixture(scope="module")
def small_setup():
    cfg = get_config("retinanet_r50_640", **{
        "model.image_size": (64, 64),
        "model.num_classes": 4,
        "train.max_gt": 4,
        "eval.batch_size": 2,
    })
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    ds = SyntheticDetectionDataset(num_images=5, image_size=(96, 96),
                                   num_classes=4, max_objects=2, seed=2)
    return cfg, variables, ds


def test_iter_detections_covers_all_images_in_orig_coords(small_setup):
    cfg, variables, ds = small_setup
    seen = {}
    for img_id, boxes, scores, labels in iter_detections(variables, ds, cfg):
        seen[img_id] = boxes
        if len(boxes):
            # boxes are mapped back to ORIGINAL 96×96 coords (canvas is
            # 64×64; clip-at-canvas / scale ⇒ ≤ 96)
            assert boxes.max() <= 96.1
            assert boxes.min() >= 0.0
    assert sorted(seen) == list(range(5))  # incl. the padded final batch


def test_run_coco_eval_structure(small_setup):
    cfg, variables, ds = small_setup
    res = run_coco_eval(variables, ds, cfg)
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
              "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"):
        assert k in res.stats
    assert -1.0 <= res.stats["AP"] <= 1.0  # untrained model: ~0


def test_run_voc_eval_structure(small_setup):
    cfg, variables, ds = small_setup
    res = run_voc_eval(variables, ds, cfg)
    assert "mAP" in res
    assert 0.0 <= res["mAP"] <= 1.0


def test_max_images_caps_work(small_setup):
    cfg, variables, ds = small_setup
    n = sum(1 for _ in iter_detections(variables, ds, cfg, max_images=3))
    assert n == 3
