"""Model build + fused inference path (benchmark configs 1 & 2).

``detect`` is the TPU replacement for the reference's eval branch
(SURVEY.md §3.2): backbone → FPN → heads → sigmoid → box decode → clip →
class-aware NMS → top-k, ONE jit region, postprocessing never leaves the
chip. Anchors are trace-time constants (detjax.ops.anchors).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from detjax.config import Config, get_config
from detjax.models.detector import Detector, build_detector
from detjax.ops.anchors import AnchorConfig, anchors_for_shape
from detjax.ops.nms import Detections, fused_detect_postprocess


def anchor_config(cfg: Config) -> AnchorConfig:
    m = cfg.model
    return AnchorConfig(
        min_level=m.min_level, max_level=m.max_level,
        scales=m.anchor_scales, ratios=m.anchor_ratios,
        base_scale=m.anchor_base_scale,
        per_level_sizes=m.anchor_per_level_sizes)


def build_model(preset: str, rng: Any = None, **overrides):
    """Mirror of the reference's model build (SURVEY.md §0.11).

    Returns ``(module, variables)`` — the functional analog of
    ``model = resnet50(num_classes, pretrained=True)``.
    """
    cfg = preset if isinstance(preset, Config) else get_config(preset, **overrides)
    module = build_detector(cfg.model)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    h, w = cfg.model.image_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(module.init, static_argnames=("train",))(
        rng, dummy, train=False)
    return module, variables


@functools.lru_cache(maxsize=8)
def _detect_fn(cfg: Config):
    """Compile-once fused detect step for a config (hashable dataclass)."""
    module = build_detector(cfg.model)
    anchors_np = anchors_for_shape(cfg.model.image_size, anchor_config(cfg))
    e = cfg.eval

    @jax.jit
    def run(variables, images) -> Detections:
        anchors = jnp.asarray(anchors_np)
        cls_logits, box_deltas = module.apply(variables, images, train=False)
        # fp32 box deltas: bf16 would quantize decoded coords to ~2 px at
        # 640. Class scores stay as raw logits — candidate selection runs
        # in the logit domain (sigmoid is monotone, identical detections)
        # and sigmoid applies only to the selected pairs, skipping a full
        # [B, A, K] elementwise pass (~1 ms/batch at bs=8).
        box_deltas = box_deltas.astype(jnp.float32)
        return fused_detect_postprocess(
            box_deltas, anchors, cls_logits,
            box_std=cfg.model.box_std,
            image_size=cfg.model.image_size,
            score_threshold=e.score_threshold,
            iou_threshold=e.nms_iou_threshold,
            num_candidates=e.pre_nms_top_k,
            max_detections=e.max_detections,
            exact=e.exact_candidates,
            scores_are_logits=True,
            topk=e.topk_mode)

    return run


def detect(variables, images, preset: str = "retinanet_r50_640",
           **overrides) -> Detections:
    """End-to-end batched inference; images [B,H,W,3] normalized NHWC.

    Returns static-shape :class:`Detections` (boxes/scores/labels/num_valid).
    """
    cfg = preset if isinstance(preset, Config) else get_config(preset, **overrides)
    if images.ndim == 3:
        images = images[None]
    return _detect_fn(cfg)(variables, images)


@functools.lru_cache(maxsize=8)
def _detect_u8_fn(cfg: Config):
    """Fused normalize+detect: [B,H,W,3] uint8 canvases → Detections in
    ONE jit region. The serving path's production shape: uint8 H2D (4×
    fewer bytes than fp32), normalize fuses into the stem's input read,
    no intermediate normalized batch in HBM, one dispatch instead of two
    (the normalize-jit + detect-jit split costs a host dispatch plus a
    write+read of the full batch at the boundary). Numerics are identical
    to ``device_augment(out_dtype=model.dtype)`` + :func:`detect`: fp32
    normalize math, one cast to the model dtype."""
    from detjax.data.pipeline import normalize_u8

    inner = _detect_fn(cfg)
    mean = tuple(cfg.data.mean)
    std = tuple(cfg.data.std)
    dtype = cfg.model.dtype

    @jax.jit
    def run(variables, canvases_u8) -> Detections:
        return inner(variables, normalize_u8(canvases_u8, mean, std, dtype))

    return run


def detect_u8(variables, canvases_u8, preset: str = "retinanet_r50_640",
              **overrides) -> Detections:
    """:func:`detect` over RAW uint8 letterboxed canvases — normalization
    (``cfg.data.mean/std``) happens inside the same jit region."""
    cfg = preset if isinstance(preset, Config) else get_config(preset, **overrides)
    if canvases_u8.ndim == 3:
        canvases_u8 = canvases_u8[None]
    return _detect_u8_fn(cfg)(variables, canvases_u8)
