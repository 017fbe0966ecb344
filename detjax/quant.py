"""Post-training int8 quantized inference engine (TPU-native).

The v5e MXU runs s8×s8→s32 at 2× its bf16 rate; measured end-to-end on
head-shaped conv chains (including requantization) the win is ~1.4–1.5×
(scripts/profile_int8.py). This module adds a **PTQ inference path** for
any trained detjax detector — a capability with no reference counterpart
(the reference serves fp32; SURVEY.md §3.2), built because inference is
2 of the 5 benchmark configs (BASELINE.json configs 1, 2).

Design (idiomatic XLA, no torch-style observers):

1. ``forward_fp`` — a pure-function re-statement of ``Detector.__call__``
   (models/{resnet,fpn,heads}.py) over the SAME variables tree, used to
   (a) prove the traversal is faithful (tests diff it against
   ``module.apply``) and (b) record per-conv-site activation scales in one
   jitted calibration pass (``calibrate``).
2. ``quantize`` — folds frozen BN into conv weights (fp32), quantizes
   per-output-channel symmetric int8, and packages
   ``{weights, act_scales}``.
3. ``forward_int8`` — same traversal where every conv is
   quantize(x)→s8 conv→dequant(+bias); residual adds / pool / upsample
   stay bf16. Entirely jit-compatible; the requant ops fuse into the
   surrounding VPU work.
4. ``detect_int8`` — forward_int8 + the existing fused decode/NMS
   postprocess (ops/nms.fused_detect_postprocess), one jit region.

Accuracy: symmetric per-channel weights + per-site abs-max activation
scales keep the synthetic-gate AP intact (tests/test_quant.py asserts
detection agreement on a trained model).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from detjax.config import Config
from detjax.models.resnet import RESNET_SPECS

Array = jnp.ndarray

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def _conv(x: Array, w: Array, stride: int = 1,
          pad: Optional[int] = None, **kw) -> Array:
    """NHWC/HWIO conv with symmetric padding (k//2 default — matches the
    explicit torch-equivalent padding used across detjax models)."""
    k = w.shape[0]
    p = k // 2 if pad is None else pad
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=_DN, **kw)


def _bn(x: Array, scale, bias, mean, var, dtype, eps: float = 1e-5) -> Array:
    """linen nn.BatchNorm frozen semantics (use_running_average, dtype
    compute): y = (x - mean) * (scale * rsqrt(var + eps)) + bias."""
    mul = (scale * lax.rsqrt(var + eps)).astype(dtype)
    return (x - mean.astype(dtype)) * mul + bias.astype(dtype)


def _upsample_nearest_2x(x: Array, out_hw) -> Array:
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    y = y.reshape(b, h * 2, w * 2, c)
    return y[:, : out_hw[0], : out_hw[1], :]


def _fold_bn_fp32(kernel, bn_p, bn_s, eps: float = 1e-5):
    """Fold frozen BN into conv weights, all fp32: (w_eff, b_eff)."""
    s = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
        np.asarray(bn_s["var"], np.float32) + eps)
    w = np.asarray(kernel, np.float32) * s
    b = np.asarray(bn_p["bias"], np.float32) - np.asarray(
        bn_s["mean"], np.float32) * s
    return w, b


class QTensor(NamedTuple):
    """An int8-quantized activation and its (symmetric) scale.

    Threaded through the backbone in int8 mode so inter-layer activations
    live in HBM at half the bytes of bf16 — the backbone is
    bandwidth-bound at inference (docs/ROOFLINE.md), so this is where the
    int8 win beyond the MXU rate comes from."""

    q: Array  # int8
    s: Array  # [] fp32 scale: x ≈ q * s


class _FpMode:
    """Bf16 conv+BN traversal over the raw flax variables — mirrors the
    Detector modules op for op. ``record=True`` collects per-site input
    abs-max for calibration."""

    def __init__(self, variables, dtype=jnp.bfloat16, record: bool = False,
                 calib_mode: str = "absmax"):
        self.p = variables["params"]
        self.s = variables.get("batch_stats", {})
        self.dtype = dtype
        self.record = record
        if calib_mode not in CALIB_MODES:
            raise ValueError(
                f"calib_mode must be one of {sorted(CALIB_MODES)}, "
                f"got {calib_mode!r}")
        self.calib_mode = calib_mode
        self.stats: Dict[str, Array] = {}

    def _rec(self, site: str, x: Array) -> None:
        if self.record:
            a = jnp.abs(x.astype(jnp.float32))
            if self.calib_mode == "absmax":
                m = jnp.max(a)
            else:  # "p999": clip the top 0.1% of activations — robust to
                # lone outliers that would otherwise stretch the int8 range
                # and waste resolution on the bulk (BASELINE.md calibration
                # study, VERDICT r3 #7)
                m = jnp.percentile(a.reshape(-1), 99.9)
            self.stats[site] = jnp.maximum(self.stats.get(site, 0.0), m)

    def _get(self, tree, path):
        node = tree
        for q in path.split("/"):
            node = node[q]
        return node

    def cbr(self, path: str, site: str, x: Array, stride: int = 1,
            relu: bool = True) -> Array:
        """Backbone conv(no bias)+frozen-BN(+relu). ``path`` like
        "backbone/layer1_block0/conv1" with bn sibling name derived."""
        self._rec(site, x)
        mod, leaf = path.rsplit("/", 1)
        bn_name = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                   "downsample_conv": "downsample_bn"}[leaf]
        w = self._get(self.p, path)["kernel"].astype(self.dtype)
        y = _conv(x, w, stride)
        bp = self._get(self.p, f"{mod}/{bn_name}")
        bs = self._get(self.s, f"{mod}/{bn_name}")
        y = _bn(y, bp["scale"], bp["bias"], bs["mean"], bs["var"], self.dtype)
        return nn_relu(y) if relu else y

    def conv(self, path: str, site: str, x: Array, stride: int = 1) -> Array:
        """FPN/head conv with bias, no BN."""
        self._rec(site, x)
        node = self._get(self.p, path)
        w = node["kernel"].astype(self.dtype)
        y = _conv(x, w, stride)
        return y + node["bias"].astype(self.dtype)

    # producer-side requant points (int8-native backbone chain). In fp mode
    # they just record the producer abs-max and pass through.
    def requant(self, site: str, x: Array) -> Array:
        self._rec(site, x)
        return x

    def dequant(self, x: Array) -> Array:
        return x

    def maxpool(self, x: Array) -> Array:
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1),
                                 ((0, 0), (1, 1), (1, 1), (0, 0)))


class _Int8Mode:
    """Same traversal over a quantized tree. Backbone activations are
    threaded as :class:`QTensor` (int8 in HBM); FPN/head inputs are
    quantized at the consumer with their calibrated site scale."""

    def __init__(self, qtree, dtype=jnp.bfloat16):
        self.q = qtree  # {"weights": {path: {w, ws, b}}, "act_scales": {site: sx}}
        self.dtype = dtype

    def _apply(self, path, site, x: Union[Array, QTensor], stride):
        node = self.q["weights"][path]
        if "w16" in node:  # bf16 island (stem): int8 buys nothing at C=3
            if isinstance(x, QTensor):
                x = self.dequant(x)
            y = _conv(x.astype(self.dtype), node["w16"].astype(self.dtype),
                      stride)
            return y + node["b"].astype(self.dtype)
        w_i8, ws, b = (node[k] for k in ("w", "ws", "b"))
        if isinstance(x, QTensor):
            xq, sx = x.q, x.s  # producer already quantized — half-byte HBM read
        else:
            sx = self.q["act_scales"][site]
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
        y = _conv(xq, w_i8, stride, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * ws) + b).astype(self.dtype)

    def cbr(self, path, site, x, stride=1, relu=True):
        y = self._apply(path, site, x, stride)  # BN folded at quantize time
        return nn_relu(y) if relu else y

    def conv(self, path, site, x, stride=1):
        return self._apply(path, site, x, stride)

    def requant(self, site: str, x: Array) -> QTensor:
        s = self.q["act_scales"][site]
        return QTensor(
            jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                     -127, 127).astype(jnp.int8), s)

    def dequant(self, x: Union[Array, QTensor]) -> Array:
        if isinstance(x, QTensor):
            return (x.q.astype(jnp.float32) * x.s).astype(self.dtype)
        return x

    def maxpool(self, x: Union[Array, QTensor]) -> Union[Array, QTensor]:
        # int8 max == fp max order (s > 0); pool stays in the int8 domain
        if isinstance(x, QTensor):
            return QTensor(
                lax.reduce_window(x.q, jnp.int8(-128), lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1),
                                  ((0, 0), (1, 1), (1, 1), (0, 0))),
                x.s)
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1),
                                 ((0, 0), (1, 1), (1, 1), (0, 0)))


def nn_relu(x: Array) -> Array:
    return jnp.maximum(x, 0)


def _backbone_forward(mode, cfg: Config, images: Array) -> Dict[int, Array]:
    """Mirrors models/resnet.ResNet.__call__ (frozen-BN inference path).

    ``mode.requant`` points mark where the int8 path stores activations as
    int8 in HBM (producer-side); in fp mode they record calibration
    abs-max and pass through. The channel width of ``x`` between blocks is
    the bandwidth-bound traffic the QTensor threading halves."""
    m = cfg.model
    block, stage_sizes = RESNET_SPECS[m.backbone_depth]
    x = images.astype(mode.dtype)
    x = mode.cbr("backbone/conv1", "backbone/conv1", x, stride=2)
    # pool BEFORE the requant: relu+max-pool preserve the global abs-max,
    # so the "conv1@out" calibration scale is identical at either point,
    # but quantizing after the pool touches 4× fewer elements (160² vs
    # 320² — the int8 stem was the engine's single largest op,
    # docs/ROOFLINE.md int8 trace).
    x = mode.maxpool(x)  # 3x3 s2 pad1
    x = mode.requant("backbone/conv1@out", x)
    feats: Dict[int, Array] = {}
    filters = (64, 128, 256, 512)
    for stage, (size, f) in enumerate(zip(stage_sizes, filters)):
        for bidx in range(size):
            stride = 2 if bidx == 0 and stage > 0 else 1
            base = f"backbone/layer{stage + 1}_block{bidx}"
            expansion = 4 if block == "bottleneck" else 1
            width = (x.q if isinstance(x, QTensor) else x).shape[-1]
            has_proj = (width != f * expansion or stride != 1)
            res = x
            if block == "bottleneck":
                y = mode.cbr(f"{base}/conv1", f"{base}/conv1", x)
                y = mode.requant(f"{base}/conv1@out", y)
                y = mode.cbr(f"{base}/conv2", f"{base}/conv2", y, stride)
                y = mode.requant(f"{base}/conv2@out", y)
                y = mode.cbr(f"{base}/conv3", f"{base}/conv3", y, relu=False)
            else:
                y = mode.cbr(f"{base}/conv1", f"{base}/conv1", x, stride)
                y = mode.requant(f"{base}/conv1@out", y)
                y = mode.cbr(f"{base}/conv2", f"{base}/conv2", y, relu=False)
            if has_proj:
                res = mode.cbr(f"{base}/downsample_conv",
                               f"{base}/downsample_conv", x, stride,
                               relu=False)
            else:
                res = mode.dequant(res)
            x = nn_relu(y + res)
            x = mode.requant(f"{base}@out", x)
        feats[stage + 2] = x
    return feats


def _fpn_forward(mode, cfg: Config, feats: Dict[int, Array]) -> Dict[int, Array]:
    """Mirrors models/fpn.FPN.__call__."""
    m = cfg.model
    feats = {l: f for l, f in feats.items() if l >= m.min_level}
    backbone_levels = [l for l in sorted(feats) if l >= m.min_level]
    laterals = {
        l: mode.conv(f"fpn/lateral_p{l}", f"fpn/lateral_p{l}", feats[l])
        for l in backbone_levels
    }
    top = max(backbone_levels)
    merged = {top: laterals[top]}
    for l in range(top - 1, m.min_level - 1, -1):
        up = _upsample_nearest_2x(merged[l + 1], laterals[l].shape[1:3])
        merged[l] = laterals[l] + up
    out = {l: mode.conv(f"fpn/output_p{l}", f"fpn/output_p{l}", merged[l])
           for l in merged}
    if m.max_level >= top + 1:
        out[top + 1] = mode.conv(f"fpn/output_p{top + 1}",
                                 f"fpn/output_p{top + 1}", feats[top],
                                 stride=2)
    for l in range(top + 2, m.max_level + 1):
        out[l] = mode.conv(f"fpn/output_p{l}", f"fpn/output_p{l}",
                           nn_relu(out[l - 1]), stride=2)
    return {l: out[l] for l in range(m.min_level, m.max_level + 1)}


def _flatten_level(x: Array, a: int, c: int) -> Array:
    b, h, w, _ = x.shape
    return x.reshape(b, h * w * a, c)


def _head_forward(mode, cfg: Config,
                  pyramid: Dict[int, Array]) -> Tuple[Array, Array]:
    """Mirrors models/heads.{RetinaNetHead,SSDHead}.__call__ — NOTE the
    per-site activation scales: tower weights are shared across levels but
    each (conv, level) call site calibrates its own input scale."""
    m = cfg.model
    a = m.num_anchors_per_cell
    cls_all, box_all = [], []
    if m.family == "ssd":
        for level in sorted(pyramid):
            x = pyramid[level]
            cls = mode.conv(f"head/cls_p{level}", f"head/cls_p{level}", x)
            box = mode.conv(f"head/box_p{level}", f"head/box_p{level}", x)
            cls_all.append(_flatten_level(cls, a, m.num_classes))
            box_all.append(_flatten_level(box, a, 4))
    else:
        for level in sorted(pyramid):
            x = pyramid[level]
            c = x
            for i in range(m.num_head_convs):
                c = nn_relu(mode.conv(f"head/cls_conv{i}",
                                      f"head/cls_conv{i}@p{level}", c))
            cls = mode.conv("head/cls_out", f"head/cls_out@p{level}", c)
            cls_all.append(_flatten_level(cls, a, m.num_classes))
            b = x
            for i in range(m.num_head_convs):
                b = nn_relu(mode.conv(f"head/box_conv{i}",
                                      f"head/box_conv{i}@p{level}", b))
            box = mode.conv("head/box_out", f"head/box_out@p{level}", b)
            box_all.append(_flatten_level(box, a, 4))
    return (jnp.concatenate(cls_all, axis=1),
            jnp.concatenate(box_all, axis=1))


def _forward(mode, cfg: Config, images: Array) -> Tuple[Array, Array]:
    feats = _backbone_forward(mode, cfg, images)
    pyramid = _fpn_forward(mode, cfg, feats)
    return _head_forward(mode, cfg, pyramid)


def forward_fp(variables, cfg: Config, images: Array,
               dtype=jnp.bfloat16) -> Tuple[Array, Array]:
    """Pure-function bf16 forward over the flax variables tree; tested to
    match ``Detector.apply`` (tests/test_quant.py)."""
    return _forward(_FpMode(variables, dtype), cfg, images)


# Activation-range estimators for PTQ calibration (VERDICT r3 #7):
#   absmax — the full observed range maps to ±127 (no clipping; default).
#   p999   — 99.9th percentile of |x|: clips rare outliers so the int8
#            grid spends its 255 levels on the bulk of the distribution.
# The robustness study (scripts/study_int8_calib.py → BASELINE.md) sweeps
# both against calibration-set size and distribution shift.
CALIB_MODES = ("absmax", "p999")


def calibrate(variables, cfg: Config, images: Array,
              calib_mode: str = "absmax") -> Dict[str, np.ndarray]:
    """One jitted pass over calibration ``images`` → per-site activation
    scales (sx = range/127, range per ``calib_mode``). Feed representative
    (normalized) images; a handful of batches suffices."""

    @jax.jit
    def run(images):
        mode = _FpMode(variables, jnp.bfloat16, record=True,
                       calib_mode=calib_mode)
        _forward(mode, cfg, images)
        return mode.stats

    stats = jax.device_get(run(images))
    return {site: np.float32(max(m, 1e-6) / 127.0)
            for site, m in stats.items()}


def quantize(variables, cfg: Config, act_scales: Dict[str, np.ndarray],
             ) -> Dict[str, Any]:
    """Fold BN, quantize every conv per-output-channel symmetric int8.

    Returns the qtree consumed by :func:`forward_int8` /
    :func:`detect_int8`: ``{"weights": {path: {w, ws, b}},
    "act_scales": {site: sx}}`` (all jnp arrays — a plain pytree, so it
    checkpoints/donates like any other).
    """
    p = jax.device_get(variables["params"])
    s = jax.device_get(variables.get("batch_stats", {}))
    weights: Dict[str, Dict[str, Array]] = {}

    def walk(tree, stats_tree, prefix):
        from collections.abc import Mapping

        for name, node in tree.items():
            path = f"{prefix}/{name}" if prefix else name
            if not isinstance(node, Mapping):
                continue
            if "kernel" in node:
                k = np.asarray(node["kernel"], np.float32)
                if k.ndim != 4:
                    continue
                bn_name = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                           "downsample_conv": "downsample_bn"}.get(name)
                if bn_name is not None and bn_name in tree and prefix:
                    if not stats_tree or bn_name not in stats_tree:
                        raise ValueError(
                            f"cannot fold BN for {path}: the variables "
                            f"tree has a {bn_name} sibling but no matching "
                            "batch_stats subtree (was the model built "
                            "without batch_stats, or the wrong variables "
                            "dict passed to quantize()?)")
                    w, b = _fold_bn_fp32(k, tree[bn_name],
                                         stats_tree[bn_name])
                elif "bias" in node:
                    w, b = k, np.asarray(node["bias"], np.float32)
                else:
                    w, b = k, np.zeros(k.shape[-1], np.float32)
                if path == "backbone/conv1":
                    # the stem stays bf16: a C=3 conv gains nothing from
                    # the int8 MXU rate, and skipping it removes the input
                    # quantize plus the 320²-output requant (both pure HBM
                    # cost — docs/ROOFLINE.md int8 trace). BN stays folded.
                    weights[path] = {
                        "w16": jnp.asarray(w, dtype=jnp.bfloat16),
                        "b": jnp.asarray(b, dtype=jnp.float32)}
                    continue
                ws = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-8) / 127.0
                w_i8 = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
                weights[path] = {"w": jnp.asarray(w_i8),
                                 "ws": jnp.asarray(ws, dtype=jnp.float32),
                                 "b": jnp.asarray(b, dtype=jnp.float32)}
            else:
                walk(node, (stats_tree or {}).get(name), path)

    walk(p, s, "")
    return {"weights": weights,
            "act_scales": {k: jnp.asarray(v, jnp.float32)
                           for k, v in act_scales.items()}}


def forward_int8(qtree, cfg: Config, images: Array) -> Tuple[Array, Array]:
    """Int8 forward: (cls_logits, box_deltas) in bf16 (cast at use sites)."""
    return _forward(_Int8Mode(qtree), cfg, images)


def quantize_model(variables, cfg: Config, calib_images: Array,
                   calib_mode: str = "absmax"):
    """Convenience: calibrate + quantize in one call. ``calib_mode``:
    see :data:`CALIB_MODES`."""
    return quantize(variables, cfg,
                    calibrate(variables, cfg, calib_images, calib_mode))


@functools.lru_cache(maxsize=8)
def _detect_int8_fn(cfg: Config):
    from detjax.modeling import anchor_config
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.nms import fused_detect_postprocess

    anchors_np = anchors_for_shape(cfg.model.image_size, anchor_config(cfg))
    e = cfg.eval

    @jax.jit
    def run(qtree, images):
        cls_logits, box_deltas = forward_int8(qtree, cfg, images)
        box_deltas = box_deltas.astype(jnp.float32)
        # logit-domain candidate selection — see modeling._detect_fn
        return fused_detect_postprocess(
            box_deltas, jnp.asarray(anchors_np), cls_logits,
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


def detect_int8(qtree, images: Array, cfg: Config):
    """End-to-end int8 inference: images → Detections (same contract as
    :func:`detjax.modeling.detect`)."""
    if images.ndim == 3:
        images = images[None]
    return _detect_int8_fn(cfg)(qtree, images)


@functools.lru_cache(maxsize=8)
def _detect_int8_u8_fn(cfg: Config):
    """Fused normalize + int8 detect over raw uint8 canvases, one jit
    region — the int8 serving path's analog of
    :func:`detjax.modeling._detect_u8_fn` (see there for why)."""
    from detjax.data.pipeline import normalize_u8

    inner = _detect_int8_fn(cfg)
    mean = tuple(cfg.data.mean)
    std = tuple(cfg.data.std)
    dtype = cfg.model.dtype

    @jax.jit
    def run(qtree, canvases_u8):
        return inner(qtree, normalize_u8(canvases_u8, mean, std, dtype))

    return run


def detect_int8_u8(qtree, canvases_u8: Array, cfg: Config):
    """:func:`detect_int8` over RAW uint8 letterboxed canvases —
    normalization happens inside the same jit region."""
    if canvases_u8.ndim == 3:
        canvases_u8 = canvases_u8[None]
    return _detect_int8_u8_fn(cfg)(qtree, canvases_u8)
