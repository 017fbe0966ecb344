"""Evaluation: COCO-style bbox mAP without pycocotools (SURVEY.md §2a).

The reference evaluates via pycocotools' C/Cython COCOeval (SURVEY.md §3.3);
that package is absent here [ENV], so this is a from-scratch re-implementation
of COCOeval's bbox protocol (101-point interpolated AP, area ranges, maxDets,
crowd handling) — the accuracy gate for mAP parity. A C++ fast path for the
hot per-image matching lives in detjax/native (same results, ~10× faster on
large result sets); numpy remains the always-available reference.
"""

from detjax.evaluation.coco_map import COCOMetric, evaluate_detections
from detjax.evaluation.evaluator import run_coco_eval
from detjax.evaluation.protocol import run_coco_eval_protocol
from detjax.evaluation.voc import evaluate_voc

__all__ = ["COCOMetric", "evaluate_detections", "run_coco_eval",
           "run_coco_eval_protocol", "evaluate_voc"]
