"""Model zoo: ResNet backbones, FPN neck, RetinaNet & SSD-style heads
(SURVEY.md §2 #1–#5).

TPU-first conventions used throughout:
  * NHWC activations (XLA:TPU's native conv layout)
  * bfloat16 compute / float32 params ("dtype" vs "param_dtype")
  * static shapes everywhere; feature levels are a dict keyed by level int
  * BN can run frozen (pretrained-backbone semantics, SURVEY.md §3.5) or
    in batch-stats mode for from-scratch training
"""

from detjax.models.resnet import (
    RESNET_SPECS,
    BasicBlock,
    BottleneckBlock,
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnet_by_depth,
)
from detjax.models.fpn import FPN
from detjax.models.heads import RetinaNetHead, SSDHead
from detjax.models.detector import Detector, build_detector

__all__ = [
    "RESNET_SPECS",
    "BasicBlock",
    "BottleneckBlock",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnet_by_depth",
    "FPN",
    "RetinaNetHead",
    "SSDHead",
    "Detector",
    "build_detector",
]
