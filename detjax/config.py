"""Frozen dataclass configs with named presets for the five benchmark configs.

Replaces the reference's argparse flag system (SURVEY.md §5.6: ``train.py``
argparse ``--dataset --coco_path --depth --epochs``) with typed, hashable,
jit-static configuration objects. Preset names map 1:1 to the driver's
benchmark configs (BASELINE.json ``configs``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of backbone + neck + heads.

    Mirrors reference capability SURVEY.md §2 #1–#5 (ResNet backbone, FPN
    neck, cls/box heads, SSD-512 variant).
    """

    name: str = "retinanet_r50_640"
    family: str = "retinanet"  # "retinanet" | "ssd"
    backbone_depth: int = 50  # 18 | 34 | 50 | 101 | 152 (lineage --depth)
    image_size: Tuple[int, int] = (640, 640)  # (H, W), static
    num_classes: int = 80
    # FPN / pyramid
    min_level: int = 3
    max_level: int = 7
    fpn_channels: int = 256
    # Heads
    head_channels: int = 256
    num_head_convs: int = 4
    # Anchors (RetinaNet defaults; SURVEY.md §2 #6)
    anchor_scales: Tuple[float, ...] = (2 ** 0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_base_scale: float = 4.0  # base size = base_scale * stride = 2^(lvl+2)
    # SSD-style per-level absolute anchor sizes (px), one tuple per level;
    # overrides the stride-proportional rule when set (SURVEY.md §2 #5)
    anchor_per_level_sizes: Tuple[Tuple[float, ...], ...] = ()
    # Prior-probability init for the classification head bias (SURVEY.md §3.5)
    prior_prob: float = 0.01
    # Box encode/decode stds (SURVEY.md §2 #9/#10)
    box_std: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    # BN semantics: frozen (inference stats, pretrained backbone) or batch
    frozen_backbone_bn: bool = True
    # Compute dtype on TPU; params stay fp32
    dtype: str = "bfloat16"
    # Pallas fused identity-bottleneck kernels for the early backbone
    # stages: "auto" = on TPU only, "on", "off". Default OFF: measured
    # in-graph parity with XLA's own blocks on the train step (the fusion
    # win is offset by the kernel's m=64 MXU underutilization) and a small
    # regression on the inference path — see ROADMAP round-2 notes.
    fused_backbone: str = "off"
    # Lower the bottleneck's stride-1 1×1 convs with dot-form pieces to
    # sidestep XLA:TPU's pathological conv-form 1×1 weight-gradient
    # lowering (5–30× off roofline at the layer1/2 shapes —
    # scripts/profile_conv_bwd.py). "on"/"full" = dot-form forward
    # (measured IN-GRAPH: loses 11 %, the reshape breaks conv-BN-ReLU
    # fusion); "dw" = conv-form forward/dX with dot-form dW only via a
    # custom VJP; "auto" = the measured best for the backend ("off" —
    # see ROADMAP round-3 conv-backward verdict); "off" = plain convs.
    dot_1x1: str = "off"
    # Rematerialize the early backbone region in the backward pass
    # instead of saving its activations to HBM: 0 = off, 1 = stem,
    # 2 = stem+layer1, 3 = stem+layer1+layer2 — the stem/layer1
    # bandwidth-overhang traffic-reduction A/B (VERDICT r3 #3; bit-
    # identical numerics, measured verdict in docs/ROOFLINE.md).
    remat_early: int = 0
    # Variant (b): blocks of the first N backbone stages remat with their
    # input stored as float8_e4m3 — halves the residual bytes AND drops
    # the intra-block saves, at an f8-quantized-input accuracy cost
    # (models/resnet._block_from_f8). Default off; A/B knob only.
    f8_remat_stages: int = 0

    @property
    def num_anchors_per_cell(self) -> int:
        n_scales = (len(self.anchor_per_level_sizes[0])
                    if self.anchor_per_level_sizes
                    else len(self.anchor_scales))
        return n_scales * len(self.anchor_ratios)

    @property
    def levels(self) -> Tuple[int, ...]:
        return tuple(range(self.min_level, self.max_level + 1))


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop hyperparameters (SURVEY.md §2 #16)."""

    batch_size: int = 16
    optimizer: str = "adam"
    learning_rate: float = 1e-5
    grad_clip_norm: float = 0.1
    # ReduceLROnPlateau analog: piecewise-constant decay on plateau is not
    # jit-friendly; we expose both plateau (host-side) and cosine schedules.
    lr_schedule: str = "plateau"  # "plateau" | "cosine" | "constant"
    num_epochs: int = 100
    # Matching thresholds (SURVEY.md §2 #7)
    fg_iou_threshold: float = 0.5
    bg_iou_threshold: float = 0.4
    # Losses (SURVEY.md §2 #8/#9)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 1.0 / 9.0
    # Static max ground-truth boxes per image (padding with validity mask)
    max_gt: int = 100
    # Gradient accumulation: split each batch into this many equal
    # micro-batches inside ONE jit step (lax.scan), averaging grads before
    # the clip+optimizer update — trades peak activation memory for steps
    # (bs=16 effective batches on memory that only fits bs=4). With frozen
    # BN the per-image loss normalization (ops/losses.py) makes this
    # MATHEMATICALLY equal to the full-batch gradient (tested); with BN
    # training or uint8 in-step augmentation it has the standard
    # accumulate-over-micro-batches semantics (BN stats per micro-batch,
    # per-micro-batch flip stream), not bit-equality.
    grad_accum_steps: int = 1
    # Transfer-leak guard (train/loop.py): purge jit caches every N steps
    # to release h2d argument buffers the axon tunnel's PJRT client pins
    # per cached executable (+9.45 MB/step measured — OOMs long runs).
    # 0 = auto: 2500 on the axon backend, off elsewhere; -1 = force off.
    leak_guard_every: int = 0
    # Exponential moving average of params (0 = off). A standard
    # production-detection accuracy lever the reference lacks: the EMA
    # tree shadows params in TrainState (updated inside the same jit
    # step), is checkpointed alongside, and serves via
    # ``train.step.ema_variables(state)`` / the eval CLI's ``--ema``.
    ema_decay: float = 0.0
    checkpoint_every_steps: int = 1000
    eval_every_steps: int = 5000
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline (SURVEY.md §2 #13–#15, §3.4)."""

    dataset: str = "coco"
    data_dir: str = ""
    train_split: str = "train2017"
    eval_split: str = "val2017"
    # Fixed output shape == model image_size; pad-to-stride handled by the
    # fixed canvas (stride 128 ⊇ stride 32 of the reference).
    hflip_prob: float = 0.5
    random_crop: bool = True
    crop_min_scale: float = 0.3
    crop_max_scale: float = 1.0
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    prefetch: int = 2
    host_workers: int = 8
    # Eval-side resize rule. () = canvas-fit scale (training rule);
    # (608, 1024) = the reference Resizer's min-side/max-side protocol
    # scale (SURVEY.md §2 #14) — required for mAP parity runs, where
    # object-scale statistics must match the reference's eval resolution.
    eval_scale_minmax: Tuple[int, ...] = ()
    # Double-buffered async jax.device_put in fit(): the next batch's H2D
    # overlaps the current step's compute (SURVEY.md §7). Right for real
    # TPU hosts; measured INVERTED through this box's axon tunnel, where
    # the prefetched transfer's bytes serialize ahead of the next step's
    # dispatch commands (BASELINE.md round-3 note, 0.24× vs serial).
    # "auto" (default): fit() times one real batch transfer against one
    # compiled step at startup and enables prefetch only when the
    # transfer is small enough to hide under compute
    # (pipeline.prefetch_is_profitable — VERDICT r3 #4). True/False
    # force it on/off.
    device_prefetch: Any = "auto"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Inference / eval path (SURVEY.md §3.2, §3.3)."""

    score_threshold: float = 0.05
    nms_iou_threshold: float = 0.5
    pre_nms_top_k: int = 1000  # global candidate prefilter size
    max_detections: int = 100  # COCO maxDets
    batch_size: int = 8
    # exact candidate prefilter (global sort-based top-k over all A·K
    # pairs) vs the production two-stage anchor-first selection (max over
    # classes → top-k anchors → top-k pairs; ~30× cheaper, mAP-neutral —
    # see ops/nms._select_candidates)
    exact_candidates: bool = False
    # candidate top-k lowering: "auto" = TPU PartialReduce (exact value
    # multiset; tie order within bit-equal scores may differ from the
    # full sort), "exact" = lax.top_k full sort everywhere, "partial" =
    # force the PartialReduce path (see ops/nms._select_candidates)
    topk_mode: str = "auto"


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)


def _retinanet_r50_640() -> Config:
    """Benchmark configs 1 & 3: RetinaNet R50+FPN @ 640."""
    return Config(
        model=ModelConfig(name="retinanet_r50_640", backbone_depth=50,
                          image_size=(640, 640)),
        train=TrainConfig(batch_size=16),
    )


def _ssd_anchor_sizes(image: int = 512, n_levels: int = 5,
                      s_min: float = 0.1, s_max: float = 0.9
                      ) -> Tuple[Tuple[float, float], ...]:
    """SSD anchor-scale rule: per-level fraction s_k of the input size,
    linearly interpolated s_min→s_max, plus the geometric-mean extra scale
    √(s_k·s_{k+1}) — anchor sizes chosen per LEVEL, not proportional to the
    stride like RetinaNet's (SURVEY.md §2 #5 SSD-style head)."""
    s = [s_min + (s_max - s_min) * k / (n_levels - 1) for k in range(n_levels)]
    s.append(2 * s[-1] - s[-2])  # extrapolate s_{K+1} for the last level
    return tuple((image * s[k], image * (s[k] * s[k + 1]) ** 0.5)
                 for k in range(n_levels))


def _ssd_512() -> Config:
    """Benchmark config 2: SSD-style single-shot head @ 512, bs=8 infer."""
    return Config(
        model=ModelConfig(
            name="ssd_512", family="ssd", backbone_depth=50,
            image_size=(512, 512), min_level=3, max_level=7,
            anchor_per_level_sizes=_ssd_anchor_sizes(512, 5),
            anchor_ratios=(1.0, 2.0, 0.5),
        ),
        eval=EvalConfig(batch_size=8),
    )


def _retinanet_r101_fpn() -> Config:
    """Benchmark config 4: R101 multi-scale FPN P3–P7 train+eval."""
    return Config(
        model=ModelConfig(name="retinanet_r101_fpn", backbone_depth=101,
                          image_size=(640, 640)),
        train=TrainConfig(batch_size=16),
    )


def _coco_v5e8() -> Config:
    """Benchmark config 5: full COCO train loop, pjit DP over v5e-8."""
    return Config(
        model=ModelConfig(name="coco_v5e8", backbone_depth=50,
                          image_size=(640, 640)),
        train=TrainConfig(batch_size=128),  # 16/chip × 8 chips
    )


def _retinanet_r50_1024() -> Config:
    """Eval-resolution protocol preset: letterbox to 1024 with the
    reference Resizer's min-608/max-1024 scale rule (SURVEY.md §2 #14) —
    every val2017 image is evaluated at EXACTLY its reference scale
    (e.g. 480×640 → 1.2667×, not canvas-fit 1.6×), on a canvas every
    such image fits."""
    return Config(
        model=ModelConfig(name="retinanet_r50_1024", backbone_depth=50,
                          image_size=(1024, 1024)),
        train=TrainConfig(batch_size=8),
        data=DataConfig(eval_scale_minmax=(608, 1024)),
        eval=EvalConfig(batch_size=4),
    )


def _retinanet_r50_640_latency() -> Config:
    """Single-image serving preset (benchmark config 1 latency pass):
    identical model, smaller NMS candidate set. Measured on v5e, bs=1
    640px: pre_nms_top_k 1000 → 4.34 ms, 512 → 3.71, 256 → 3.40 — the
    candidate top-k + NMS scan is ~25 % of bs=1 device latency. 512 keeps
    >5 candidates per final detection slot (max_detections=100), which on
    trained models leaves the NMS keep-set unchanged at the 0.05 score
    floor; drop to 256 via --set eval.pre_nms_top_k=256 for latency-
    critical serving where ≤100 crowded detections are acceptable."""
    return Config(
        model=ModelConfig(name="retinanet_r50_640_latency",
                          backbone_depth=50, image_size=(640, 640)),
        eval=EvalConfig(batch_size=1, pre_nms_top_k=512),
    )


PRESETS = {
    "retinanet_r50_640": _retinanet_r50_640,
    "retinanet_r50_640_latency": _retinanet_r50_640_latency,
    "ssd_512": _ssd_512,
    "retinanet_r101_fpn": _retinanet_r101_fpn,
    "coco_v5e8": _coco_v5e8,
    "retinanet_r50_1024": _retinanet_r50_1024,
}


def get_config(name: str, **overrides) -> Config:
    """Build a preset config; ``overrides`` use dotted keys, e.g.
    ``get_config("retinanet_r50_640", **{"train.batch_size": 8})``."""
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = PRESETS[name]()
    if not overrides:
        return cfg
    groups: dict = {"model": {}, "train": {}, "data": {}, "eval": {}}
    for key, val in overrides.items():
        group, _, field = key.partition(".")
        if group not in groups or not field:
            raise ValueError(f"override key must be '<group>.<field>', got {key!r}")
        groups[group][field] = val
    return Config(
        model=dataclasses.replace(cfg.model, **groups["model"]),
        train=dataclasses.replace(cfg.train, **groups["train"]),
        data=dataclasses.replace(cfg.data, **groups["data"]),
        eval=dataclasses.replace(cfg.eval, **groups["eval"]),
    )
