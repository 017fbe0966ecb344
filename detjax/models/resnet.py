"""ResNet-50/101 backbone in flax linen (SURVEY.md §2 #1).

Structure is torchvision-compatible (v1.5: stride on the 3×3 of the
bottleneck) so ImageNet-pretrained ``state_dict`` weights can be imported
1:1 via ``detjax.utils.torch_import`` — the reference builds on torchvision
ResNets (SURVEY.md §3.5). The implementation is TPU-idiomatic, not a torch
translation: NHWC, channels-last convs that XLA tiles directly onto the MXU,
conv→BN→ReLU left unfused in the graph (XLA fuses them; at inference BN can
be folded by the importer).

BN semantics (SURVEY.md §7 "BN semantics ... biggest silent mAP killer"):
``frozen_bn=True`` runs BatchNorm with stored running stats and no stat
updates — the lineage's ``freeze_bn()`` behavior for pretrained backbones.
With ``frozen_bn=False`` stats update into the ``batch_stats`` collection.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

Conv = partial(nn.Conv, use_bias=False, padding="SAME", kernel_init=nn.initializers.he_normal())


class BottleneckBlock(nn.Module):
    """1×1 → 3×3(stride) → 1×1(×4) with projection shortcut when needed."""

    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    norm: Callable = nn.BatchNorm

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        y = Conv(self.filters, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # explicit (1,1) padding: for stride 2 this matches torch's
        # symmetric pad=1 exactly, where flax "SAME" would pad (0,1) and
        # shift the sampling grid — silent numeric drift for imported
        # torchvision weights (SURVEY.md §5.4 weight importer).
        y = Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = Conv(self.filters * 4, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            residual = Conv(self.filters * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns {2: C2, 3: C3, 4: C4, 5: C5} feature maps (NHWC).

    stage_sizes: (3,4,6,3) → R50, (3,4,23,3) → R101 (SURVEY.md §3.5).
    """

    stage_sizes: Sequence[int]
    dtype: Any = jnp.bfloat16
    frozen_bn: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[int, Array]:
        norm = partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        # torch-equivalent symmetric pad=3 (flax SAME would pad (2,3))
        x = Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                 dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats: Dict[int, Array] = {}
        filters = (64, 128, 256, 512)
        for stage, (size, f) in enumerate(zip(self.stage_sizes, filters)):
            for block in range(size):
                stride = 2 if block == 0 and stage > 0 else 1
                x = BottleneckBlock(
                    f, stride=stride, dtype=self.dtype, norm=norm,
                    name=f"layer{stage + 1}_block{block}")(x)
            feats[stage + 2] = x  # C2..C5 at strides 4,8,16,32
        return feats


def resnet50(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype, frozen_bn=frozen_bn)


def resnet101(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype, frozen_bn=frozen_bn)
