"""Pallas TPU kernels for the detection hot path (SURVEY.md §2a).

The reference's postprocessing natives — torchvision's C++/CUDA ``nms`` and
torch's CUDA elementwise box decode — are re-designed here as Pallas TPU
kernels so postprocessing never leaves the chip: candidate boxes live in
VMEM, the greedy suppression loop runs on the VPU, and only the final
[B, max_det] detections are written back to HBM.

Every kernel has a pure-lax twin in ``detjax.ops`` used as the correctness
oracle (tests diff keep-sets bit-for-bit, interpret mode on CPU).
"""

from detjax.kernels.postprocess import (
    decode_boxes_pallas,
    nms_pallas,
    pallas_available,
)

__all__ = ["decode_boxes_pallas", "nms_pallas", "pallas_available"]
