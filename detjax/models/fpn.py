"""FPN neck producing P3–P7 (SURVEY.md §2 #2 ``PyramidFeatures``).

RetinaNet-standard pyramid: lateral 1×1 on C3/C4/C5, nearest-neighbor
top-down upsample + add, 3×3 smoothing convs → P3–P5; P6 = 3×3 stride-2
conv on C5; P7 = ReLU → 3×3 stride-2 conv on P6.

Upsampling uses ``jnp.repeat``-style nearest resize on static shapes —
XLA lowers it to a cheap broadcast-reshape, no gather.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from detjax.models.spatial import unshard_tiny_levels

Array = jnp.ndarray


def _upsample_nearest_2x(x: Array, out_hw) -> Array:
    """[B,H,W,C] → [B,2H,2W,C] (cropped to out_hw for odd targets)."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    y = y.reshape(b, h * 2, w * 2, c)
    return y[:, : out_hw[0], : out_hw[1], :]


class FPN(nn.Module):
    min_level: int = 3
    max_level: int = 7
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[int, Array]) -> Dict[int, Array]:
        # explicit symmetric padding (k//2): identical to SAME at stride 1,
        # and torch-equivalent (pad=1) for the stride-2 P6/P7 convs where
        # flax SAME would pad asymmetrically (see resnet.py note)
        conv = lambda k, s, name: nn.Conv(
            self.channels, (k, k), strides=(s, s),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype, name=name,
            kernel_init=nn.initializers.he_normal())
        # Lateral projections on the backbone levels we have (C3..C5).
        backbone_levels = [l for l in sorted(feats) if l >= self.min_level]
        laterals = {
            l: conv(1, 1, f"lateral_p{l}")(feats[l]) for l in backbone_levels
        }
        # Top-down pathway.
        top = max(backbone_levels)
        merged = {top: laterals[top]}
        for l in range(top - 1, self.min_level - 1, -1):
            up = _upsample_nearest_2x(merged[l + 1], laterals[l].shape[1:3])
            merged[l] = laterals[l] + up
        out = {l: conv(3, 1, f"output_p{l}")(merged[l])
               for l in merged}
        # Extra levels from the deepest backbone feature (P6, P7).
        if self.max_level >= top + 1:
            out[top + 1] = conv(3, 2, f"output_p{top + 1}")(feats[top])
        for l in range(top + 2, self.max_level + 1):
            out[l] = conv(3, 2, f"output_p{l}")(nn.relu(out[l - 1]))
        # Spatial-mesh layout rule: levels too small to row-shard over the
        # active 'space' axis become batch-only sharded here (no-op
        # otherwise) — see detjax/models/spatial.py.
        return unshard_tiny_levels(
            {l: out[l] for l in range(self.min_level, self.max_level + 1)})
