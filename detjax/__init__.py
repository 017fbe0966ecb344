"""detjax — TPU-native single-stage object detection in JAX.

A brand-new TPU-first framework with the capabilities of the PyTorch
reference stack ``Kai7/ObjectDetection.Pytorch`` (RetinaNet R50/R101 + FPN
P3–P7 and an SSD-style 512 head). Not a port: everything is static-shape,
vectorized, jit-compiled, and sharded with ``jax.sharding`` over a device
mesh. See SURVEY.md for the full blueprint.

Public API mirrors the reference's surface (model build / train step /
detect):

    >>> import detjax
    >>> model, params = detjax.build_model("retinanet_r50_640", rng)
    >>> state, metrics = detjax.train_step(state, batch)
    >>> dets = detjax.detect(params, images)

NOTE: the reference mount at /root/reference was empty at survey time, so
docstrings cite SURVEY.md sections (the reconstructed blueprint) instead of
reference file:line.
"""

from detjax.config import (
    ModelConfig,
    TrainConfig,
    DataConfig,
    EvalConfig,
    get_config,
    PRESETS,
)
from detjax.api import build_model, train_step, detect, make_train_state

__version__ = "0.1.0"


def fit(*args, **kwargs):
    """Training-loop orchestration — see :func:`detjax.train.loop.fit`."""
    from detjax.train.loop import fit as _fit

    return _fit(*args, **kwargs)


def evaluate(*args, **kwargs):
    """COCO bbox evaluation — see :func:`detjax.evaluation.run_coco_eval`."""
    from detjax.evaluation.evaluator import run_coco_eval

    return run_coco_eval(*args, **kwargs)


def export_detect(*args, **kwargs):
    """Serving export: fused detect → StableHLO artifact — see
    :func:`detjax.export.export_detect` (save/load via
    :func:`detjax.export.save_detect` / :func:`detjax.export.load_detect`)."""
    from detjax.export import export_detect as _impl

    return _impl(*args, **kwargs)


def serve(*args, **kwargs):
    """Micro-batching detection server — constructs
    :class:`detjax.serve.DetectionServer` (see detjax-serve CLI)."""
    from detjax.serve import DetectionServer

    return DetectionServer(*args, **kwargs)


def quantize_model(*args, **kwargs):
    """Int8 PTQ: calibrate + quantize — see :func:`detjax.quant.quantize_model`."""
    from detjax.quant import quantize_model as _impl

    return _impl(*args, **kwargs)


def detect_int8(*args, **kwargs):
    """Int8 end-to-end inference — see :func:`detjax.quant.detect_int8`."""
    from detjax.quant import detect_int8 as _impl

    return _impl(*args, **kwargs)


def detect_u8(*args, **kwargs):
    """Fused normalize+detect over raw uint8 canvases (one jit region) —
    see :func:`detjax.modeling.detect_u8`."""
    from detjax.modeling import detect_u8 as _impl

    return _impl(*args, **kwargs)


def detect_int8_u8(*args, **kwargs):
    """Int8 engine over raw uint8 canvases (normalize fused in) — see
    :func:`detjax.quant.detect_int8_u8`."""
    from detjax.quant import detect_int8_u8 as _impl

    return _impl(*args, **kwargs)


__all__ = [
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "EvalConfig",
    "get_config",
    "PRESETS",
    "build_model",
    "train_step",
    "detect",
    "make_train_state",
    "fit",
    "evaluate",
    "export_detect",
    "serve",
    "quantize_model",
    "detect_int8",
    "detect_u8",
    "detect_int8_u8",
]
