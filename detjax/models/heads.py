"""Detection heads (SURVEY.md §2 #3/#4/#5).

``RetinaNetHead``: the classic pair of 4×conv-256 towers shared across all
pyramid levels — one for A·K class logits, one for A·4 box deltas. The
classification final bias is prior-prob initialized to −log((1−π)/π),
π = 0.01 (SURVEY.md §3.5 — load-bearing for early training stability).

``SSDHead``: the single-shot 512×512 variant (benchmark config 2) — one
independent 3×3 predictor pair per level, no shared tower (SSD-style).

Both emit ``(cls_logits [B, ΣA, K], box_deltas [B, ΣA, 4])`` with the anchor
ordering of ``detjax.ops.anchors`` (levels ascending; per level row-major
over (y, x), anchor-minor) so heads and anchors never need re-indexing.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


def _flatten_level(x: Array, anchors_per_cell: int, channels_out: int) -> Array:
    """[B, H, W, A*C] → [B, H*W*A, C] preserving (y, x, anchor) order."""
    b, h, w, _ = x.shape
    return x.reshape(b, h * w * anchors_per_cell, channels_out)


class RetinaNetHead(nn.Module):
    num_classes: int = 80
    anchors_per_cell: int = 9
    channels: int = 256
    num_convs: int = 4
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[int, Array]) -> Tuple[Array, Array]:
        conv = lambda c, name, bias_init=nn.initializers.zeros: nn.Conv(
            c, (3, 3), padding="SAME", dtype=self.dtype, name=name,
            kernel_init=nn.initializers.normal(0.01), bias_init=bias_init)
        cls_tower = [conv(self.channels, f"cls_conv{i}") for i in range(self.num_convs)]
        box_tower = [conv(self.channels, f"box_conv{i}") for i in range(self.num_convs)]
        bias = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        cls_out = conv(self.anchors_per_cell * self.num_classes, "cls_out",
                       bias_init=nn.initializers.constant(bias))
        box_out = conv(self.anchors_per_cell * 4, "box_out")

        cls_all, box_all = [], []
        for level in sorted(feats):
            x = feats[level]
            c = x
            for layer in cls_tower:
                c = nn.relu(layer(c))
            cls_all.append(_flatten_level(cls_out(c), self.anchors_per_cell,
                                          self.num_classes))
            b = x
            for layer in box_tower:
                b = nn.relu(layer(b))
            box_all.append(_flatten_level(box_out(b), self.anchors_per_cell, 4))
        return (jnp.concatenate(cls_all, axis=1),
                jnp.concatenate(box_all, axis=1))


class SSDHead(nn.Module):
    """Per-level independent single-conv predictors (SSD-style, config 2)."""

    num_classes: int = 80
    anchors_per_cell: int = 9
    prior_prob: float = 0.01
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[int, Array]) -> Tuple[Array, Array]:
        bias = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        cls_all, box_all = [], []
        for level in sorted(feats):
            x = feats[level]
            cls = nn.Conv(self.anchors_per_cell * self.num_classes, (3, 3),
                          padding="SAME", dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(bias),
                          name=f"cls_p{level}")(x)
            box = nn.Conv(self.anchors_per_cell * 4, (3, 3), padding="SAME",
                          dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name=f"box_p{level}")(x)
            cls_all.append(_flatten_level(cls, self.anchors_per_cell,
                                          self.num_classes))
            box_all.append(_flatten_level(box, self.anchors_per_cell, 4))
        return (jnp.concatenate(cls_all, axis=1),
                jnp.concatenate(box_all, axis=1))
