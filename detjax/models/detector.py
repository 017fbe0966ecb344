"""Full detector assembly: backbone → FPN → head (SURVEY.md §1 model layer).

``Detector.__call__`` returns raw ``(cls_logits, box_deltas)`` in the
compute dtype (bf16) — loss attachment (train) and decode+NMS (eval) live
OUTSIDE the module as pure functions (detjax.train.step / detjax.modeling),
which is the functional-JAX analog of the reference's loss-inside-forward
design (SURVEY.md §1 "distinctive design trait"); both cast to fp32 at
their entry.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detjax.config import ModelConfig
from detjax.models.fpn import FPN
from detjax.models.heads import RetinaNetHead, SSDHead
from detjax.models.resnet import RESNET_SPECS, ResNet

Array = jnp.ndarray


class Detector(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, images: Array, train: bool = False) -> Tuple[Array, Array]:
        """images [B, H, W, 3] normalized NHWC → (cls [B,ΣA,K], box [B,ΣA,4])."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        if cfg.backbone_depth not in RESNET_SPECS:
            raise ValueError(
                f"unsupported backbone depth {cfg.backbone_depth}; "
                f"have {sorted(RESNET_SPECS)}")
        block, stage_sizes = RESNET_SPECS[cfg.backbone_depth]
        fused = (cfg.fused_backbone == "on"
                 or (cfg.fused_backbone == "auto"
                     and jax.default_backend() == "tpu"))
        if cfg.dot_1x1 not in ("off", "on", "auto", "full", "dw"):
            raise ValueError(
                f"model.dot_1x1 must be one of off/on/auto/full/dw, "
                f"got {cfg.dot_1x1!r}")
        dot_1x1 = {"on": "full", "auto": "off"}.get(cfg.dot_1x1,
                                                    cfg.dot_1x1)
        feats = ResNet(stage_sizes=stage_sizes, block=block, dtype=dtype,
                       frozen_bn=cfg.frozen_backbone_bn,
                       fused_blocks=fused, dot_1x1=dot_1x1,
                       remat_early=cfg.remat_early,
                       f8_remat_stages=cfg.f8_remat_stages,
                       name="backbone")(images, train=train)
        feats = {l: f for l, f in feats.items() if l >= cfg.min_level}
        pyramid = FPN(min_level=cfg.min_level, max_level=cfg.max_level,
                      channels=cfg.fpn_channels, dtype=dtype,
                      name="fpn")(feats)
        if cfg.family == "retinanet":
            head = RetinaNetHead(
                num_classes=cfg.num_classes,
                anchors_per_cell=cfg.num_anchors_per_cell,
                channels=cfg.head_channels, num_convs=cfg.num_head_convs,
                prior_prob=cfg.prior_prob, dtype=dtype, name="head")
        elif cfg.family == "ssd":
            head = SSDHead(
                num_classes=cfg.num_classes,
                anchors_per_cell=cfg.num_anchors_per_cell,
                prior_prob=cfg.prior_prob, dtype=dtype, name="head")
        else:
            raise ValueError(f"unknown model family {cfg.family!r}")
        cls_logits, box_deltas = head(pyramid)
        # Outputs stay in compute dtype (bf16): forcing fp32 here doubles
        # the HBM traffic of the biggest activation ([B, ΣA, K] ≈ 100 MB at
        # the flagship shape) in BOTH directions of the train step. Loss and
        # detect cast to fp32 at their own entry (bf16→fp32 is exact), so
        # the math is unchanged.
        return cls_logits, box_deltas


def build_detector(cfg: ModelConfig) -> Detector:
    return Detector(cfg=cfg)
