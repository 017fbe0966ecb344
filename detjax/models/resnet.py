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

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray

Conv = partial(nn.Conv, use_bias=False, padding="SAME", kernel_init=nn.initializers.he_normal())


class _ConvKernel(nn.Module):
    """Param-only holder with nn.Conv's exact tree (<name>/kernel, same
    shape HWIO, same he_normal init) — lets the fused-kernel path own the
    math while checkpoints/importers see an identical PyTree."""

    shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", nn.initializers.he_normal(), self.shape)


class _BNParams(nn.Module):
    """Param/stats holder matching nn.BatchNorm's tree (scale/bias +
    batch_stats mean/var, fp32)."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones, f)
        bias = self.param("bias", nn.initializers.zeros, f)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(f, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(f, jnp.float32))
        return scale, bias, mean.value, var.value


def _conv1x1(x: Array, kernel: Array) -> Array:
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv1x1_dotdw(x: Array, kernel: Array) -> Array:
    """Stride-1 1×1 conv whose WEIGHT gradient is a dot-general.

    Forward and dX stay conv-form (they fuse with the surrounding
    BN/ReLU and measure near roofline), but dW — which XLA:TPU lowers
    5–30× off roofline at the bottleneck shapes
    (scripts/profile_conv_bwd.py) — is computed as the xᵀ·dy contraction
    over the fused batch-space dim instead.
    """
    return _conv1x1(x, kernel)


def _conv1x1_dotdw_fwd(x, kernel):
    return _conv1x1(x, kernel), (x, kernel)


def _conv1x1_dotdw_bwd(res, dy):
    x, kernel = res
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    # dX: 1×1 conv with the transposed kernel — conv-form (measured fine)
    dx = _conv1x1(dy, jnp.swapaxes(kernel, 2, 3))
    # dW: [B·H·W, Cin]ᵀ × [B·H·W, Cout] dot, fp32 accumulation (the MXU
    # accumulates fp32 for the conv-form dW too)
    dw = jax.lax.dot_general(
        x.reshape(b * h * w, cin), dy.reshape(b * h * w, cout),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return dx, dw.reshape(1, 1, cin, cout).astype(kernel.dtype)


conv1x1_dotdw.defvjp(_conv1x1_dotdw_fwd, _conv1x1_dotdw_bwd)


class DotConv1x1(nn.Module):
    """Stride-1 1×1 conv with a dot-form lowering (see ``mode``).

    Param tree is identical to ``nn.Conv`` (``kernel`` of shape
    (1, 1, Cin, Cout), he_normal init) so checkpoints/importers are
    unaffected. Motivation: the conv-form WEIGHT gradient at the
    bottleneck's 1×1 shapes measures 5–30× off roofline on v5e while the
    dot-form contraction sits near it (scripts/profile_conv_bwd.py).

    mode="full": the forward itself is a [B·H·W, Cin]×[Cin, Cout] dot —
    autodiff then emits dot-form dX/dW. Measured IN-GRAPH: loses 11 %
    (106.4 vs 95.7 ms step) — the reshape breaks XLA's conv-BN-ReLU
    fusion (scripts/profile_dot1x1.py).
    mode="dw": conv-form forward/dX (fusion preserved), dot-form dW only,
    via ``conv1x1_dotdw``'s custom VJP.
    """

    features: int
    dtype: Any = jnp.bfloat16
    mode: str = "dw"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (1, 1, cin, self.features))
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        if self.mode == "dw":
            return conv1x1_dotdw(xc, kc)
        y = jax.lax.dot_general(
            xc.reshape(b * h * w, cin), kc[0, 0],
            (((1,), (0,)), ((), ())))
        return y.reshape(b, h, w, self.features)


def _block_from_f8(mod: nn.Module, x8: Array) -> Array:
    """Run a residual block from an fp8-stored input (lifted-remat body).

    The traffic-reduction variant (b) of VERDICT r3 #3: each early block
    is rematerialized with its INPUT saved as float8_e4m3 — 1 byte/elem
    instead of bf16's 2 — so the backward recomputes the block from a
    half-size residual and none of the intra-block activations round-trip
    HBM. Forward and backward both consume the f8-rounded input
    (consistent gradients); e4m3's ~2-digit mantissa on post-BN-ReLU
    activations is an accuracy knob the e2e gates measure, which is why
    the flag defaults off.
    """
    return mod(x8.astype(mod.dtype))


def _fold_bn(kernel: Array, scale, bias, mean, var,
             eps: float = 1e-5) -> Tuple[Array, Array]:
    """Fold frozen-BN affine+stats into conv weights: returns
    (w_eff bf16 [..., out], b_eff fp32 [1, out])."""
    s = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    w_eff = (kernel.astype(jnp.float32) * s).astype(jnp.bfloat16)
    b_eff = (bias - mean * s).astype(jnp.float32)[None, :]
    return w_eff, b_eff


class BottleneckBlock(nn.Module):
    """1×1 → 3×3(stride) → 1×1(×4) with projection shortcut when needed.

    ``fused=True`` routes stride-1 identity blocks through the Pallas
    fused-block kernel (detjax.kernels.bottleneck): same math, same param
    tree (see _ConvKernel/_BNParams), ~5× less HBM traffic on the
    bandwidth-bound early stages. Requires frozen-BN semantics.
    """

    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    norm: Callable = nn.BatchNorm
    fused: bool = False
    dot_1x1: str = "off"  # "off" | "full" | "dw" (see DotConv1x1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity_shape = (x.shape[-1] == self.filters * 4
                          and self.stride == 1)
        if self.fused and identity_shape and self.dtype == jnp.bfloat16:
            from detjax.kernels.bottleneck import bottleneck_identity

            c, f = x.shape[-1], self.filters
            w1 = _ConvKernel((1, 1, c, f), name="conv1")()
            w2 = _ConvKernel((3, 3, f, f), name="conv2")()
            w3 = _ConvKernel((1, 1, f, c), name="conv3")()
            bn1 = _BNParams(f, name="bn1")()
            bn2 = _BNParams(f, name="bn2")()
            bn3 = _BNParams(c, name="bn3")()
            w1e, b1e = _fold_bn(w1[0, 0], *bn1)
            w2e, b2e = _fold_bn(w2, *bn2)
            w3e, b3e = _fold_bn(w3[0, 0], *bn3)
            return bottleneck_identity(
                x.astype(jnp.bfloat16), w1e, b1e, w2e, b2e, w3e, b3e)
        residual = x
        conv1x1 = (partial(DotConv1x1, mode=self.dot_1x1)
                   if self.dot_1x1 != "off"
                   else partial(Conv, kernel_size=(1, 1)))
        y = conv1x1(self.filters, dtype=self.dtype, name="conv1")(x)
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
        y = conv1x1(self.filters * 4, dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            if self.stride == 1 and self.dot_1x1 != "off":
                residual = DotConv1x1(self.filters * 4, dtype=self.dtype,
                                      mode=self.dot_1x1,
                                      name="downsample_conv")(x)
            else:
                residual = Conv(self.filters * 4, (1, 1),
                                strides=(self.stride, self.stride),
                                dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BasicBlock(nn.Module):
    """3×3(stride) → 3×3 residual block (expansion 1) for ResNet-18/34.

    torchvision-compatible structure and naming (conv1/bn1/conv2/bn2,
    downsample on the first block of a stage when shape changes) so the
    weight importer maps ``layer{s}.{b}.conv{1,2}`` 1:1 — the lineage's
    ``BasicBlock`` (SURVEY.md §2 #1 key classes).
    """

    filters: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    norm: Callable = nn.BatchNorm

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        # symmetric (1,1) padding: torch-equivalent for stride 2 where flax
        # "SAME" pads (0,1) — see BottleneckBlock conv2 note
        y = Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                 dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = Conv(self.filters, (1, 1),
                            strides=(self.stride, self.stride),
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns {2: C2, 3: C3, 4: C4, 5: C5} feature maps (NHWC).

    stage_sizes: (3,4,6,3) → R50, (3,4,23,3) → R101 (SURVEY.md §3.5);
    block="basic" with (2,2,2,2)/(3,4,6,3) → R18/R34, (3,8,36,3) → R152 —
    the full torchvision depth family the lineage's ``--depth`` flag exposes.
    """

    stage_sizes: Sequence[int]
    block: str = "bottleneck"  # "bottleneck" (R50/101/152) | "basic" (R18/34)
    dtype: Any = jnp.bfloat16
    frozen_bn: bool = True
    fused_blocks: bool = False  # Pallas fused identity bottlenecks (TPU)
    dot_1x1: str = "off"  # stride-1 1×1 convs as dots: "off"|"full"|"dw"
    # Rematerialize the early (bandwidth-bound) region in the backward
    # instead of round-tripping its saved activations through HBM
    # (VERDICT r3 #3 traffic-reduction A/B; measured verdicts in
    # docs/ROOFLINE.md): 0 = off, 1 = stem, 2 = stem+layer1,
    # 3 = stem+layer1+layer2. Numerics are bit-identical (same ops on the
    # same inputs, recomputed).
    remat_early: int = 0
    # Variant (b) of the same A/B: blocks of the first N stages remat
    # individually with their INPUT stored as float8_e4m3 (half of bf16's
    # bytes; see _block_from_f8). Measure one variant at a time.
    f8_remat_stages: int = 0

    def _norm(self, train: bool):
        return partial(
            nn.BatchNorm,
            use_running_average=self.frozen_bn or not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )

    def _stage(self, x: Array, stage: int, train: bool) -> Array:
        """One residual stage (layer{stage+1}); child names unchanged."""
        fused = self.fused_blocks and (self.frozen_bn or not train)
        norm = self._norm(train)
        f = (64, 128, 256, 512)[stage]
        for block in range(self.stage_sizes[stage]):
            stride = 2 if block == 0 and stage > 0 else 1
            if self.block == "basic":
                mod = BasicBlock(
                    f, stride=stride, dtype=self.dtype, norm=norm,
                    name=f"layer{stage + 1}_block{block}")
            else:
                mod = BottleneckBlock(
                    f, stride=stride, dtype=self.dtype, norm=norm,
                    # only the bandwidth-bound stages win: measured at the
                    # 640px/bs16 flagship, fused vs XLA fwd+bwd per block is
                    # 5.3 vs 7.3 ms (layer1) and 2.8 vs 3.6 (layer2), but
                    # par on layer3 and a loss on layer4 (compute-bound) —
                    # scripts/profile_bottleneck.py
                    fused=fused and stage < 2,
                    dot_1x1=self.dot_1x1,
                    name=f"layer{stage + 1}_block{block}")
            if stage < self.f8_remat_stages:
                x = nn.remat(_block_from_f8)(
                    mod, x.astype(jnp.float8_e4m3fn))
            else:
                x = mod(x)
        return x

    def _early_segment(self, x: Array, train: bool):
        """Stem + the first ``remat_early - 1`` stages as ONE segment —
        the unit nn.remat wraps, so its saved activations are replaced by
        recompute-in-backward. Returns (x, feats-so-far)."""
        norm = self._norm(train)
        # torch-equivalent symmetric pad=3 (flax SAME would pad (2,3))
        x = Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                 dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        # NOTE: a Pallas backward for this max pool exists
        # (kernels/stem.py, exact SelectAndScatter routing) but measured
        # 13.1 ms vs XLA's 5.97 ms at the 640px stem shape — the phase
        # split/merge relayouts dominate. Kept as tested reference; XLA's
        # SelectAndScatter stays on the hot path (ROADMAP round-2 notes).
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats: Dict[int, Array] = {}
        for stage in range(max(0, self.remat_early - 1)):
            x = self._stage(x, stage, train)
            feats[stage + 2] = x
        return x, feats

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[int, Array]:
        x = x.astype(self.dtype)
        if self.remat_early > 0:
            early = nn.remat(ResNet._early_segment, static_argnums=(2,))
            x, feats = early(self, x, train)
        else:
            x, feats = self._early_segment(x, train)
        for stage in range(max(0, self.remat_early - 1),
                           len(self.stage_sizes)):
            x = self._stage(x, stage, train)
            feats[stage + 2] = x  # C2..C5 at strides 4,8,16,32
        return feats


# torchvision/lineage depth family (train.py --depth {18,34,50,101,152}):
# depth → (block type, stage sizes)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def resnet_by_depth(depth: int, dtype: Any = jnp.bfloat16,
                    frozen_bn: bool = True, **kw) -> ResNet:
    if depth not in RESNET_SPECS:
        raise ValueError(
            f"unsupported backbone depth {depth}; have {sorted(RESNET_SPECS)}")
    block, sizes = RESNET_SPECS[depth]
    return ResNet(stage_sizes=sizes, block=block, dtype=dtype,
                  frozen_bn=frozen_bn, **kw)


def resnet18(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return resnet_by_depth(18, dtype, frozen_bn)


def resnet34(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return resnet_by_depth(34, dtype, frozen_bn)


def resnet50(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return resnet_by_depth(50, dtype, frozen_bn)


def resnet101(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return resnet_by_depth(101, dtype, frozen_bn)


def resnet152(dtype: Any = jnp.bfloat16, frozen_bn: bool = True) -> ResNet:
    return resnet_by_depth(152, dtype, frozen_bn)
