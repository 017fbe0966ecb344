"""Evaluation: COCO-style bbox mAP without pycocotools (SURVEY.md §2a).

The reference evaluates via pycocotools' C/Cython COCOeval (SURVEY.md §3.3);
that package is absent here [ENV], so this is a from-scratch, pure-numpy
re-implementation of COCOeval's bbox protocol (101-point interpolated AP,
area ranges, maxDets, crowd handling) — the accuracy gate for mAP parity.
"""

from detjax.evaluation.coco_map import COCOMetric, evaluate_detections

__all__ = ["COCOMetric", "evaluate_detections"]
