"""Fused ResNet bottleneck block as Pallas TPU kernels (SURVEY.md §2a).

The reference runs each bottleneck as 3 cuDNN convs + BNs + adds, every
intermediate round-tripping device memory. On v5e the early ResNet stages
are HBM-bandwidth-bound: layer1 at 640px/bs16 measures ~5.9 ms fwd+bwd per
block for ~1.4 ms of MXU work (scripts/profile_regions.py). This kernel
computes the WHOLE identity block — 1×1 conv → BN(frozen, folded) → ReLU →
3×3 conv → BN → ReLU → 1×1 conv → BN → +residual → ReLU — per VMEM row
tile, so HBM traffic drops to read(x) + write(out) forward and
read(x, dy) + write(dx) backward.

Halo handling: BlockSpec windows cannot overlap, so the 3×3's ±1-row halo
arrives as EXTRA BlockSpec inputs over the same array with clamped index
maps (x passed three times: tile rows, one row above, one row below) —
everything stays on Pallas's automatic double-buffered pipeline; an
earlier manual-DMA version serialized ~15 µs of copy latency into every
grid step and lost most of the fusion win. Out-of-image halo rows load a
clamped (wrong) row and are neutralized by masking y1 to zero there —
exactly the conv's zero padding after the 1×1+ReLU is zeroed.

The backward is a custom VJP that RECOMPUTES y1/y2 per tile from x (the
stage is bandwidth-bound; ~1.5× extra MXU flops for ~5× less HBM traffic)
and accumulates the six weight grads in fp32 VMEM across grid steps
(constant output-block index = resident accumulator).

Frozen-BN folding happens OUTSIDE (models/resnet.py): the kernel sees
effective weights w' = w·γ/√(σ²+ε) and biases; autodiff carries gradients
back onto the raw conv kernels and BN affines through the fold.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _pick_th(h: int, w: int, c: int, backward: bool) -> int:
    """Largest even row tile that divides H within the measured VMEM
    budget (lane padding makes m=64 stages cost double — hence the
    c-dependent caps; layer1 bwd th=16 and layer3 bwd th=20 both blow
    VMEM on v5e, th=8 compiles)."""
    if backward:
        cap_rows = 1280 if c <= 512 else 320
    else:
        cap_rows = 2560 if c <= 512 else 640
    best = 0
    for th in range(2, h + 1, 2):
        if h % th == 0 and th * w <= cap_rows:
            best = th
    if best == 0:
        best = 2 if h % 2 == 0 else h
    return best


def _row_specs(h: int, th: int, w: int, c: int, halo: int):
    """(mid, up, dn) BlockSpecs over one [B,H,W,C] array: the th-row tile
    plus `halo` rows above/below (clamped at the image edge — the kernel
    masks those to zero). `halo` must divide th."""
    k = th // halo
    mid = pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    up = pl.BlockSpec(
        (1, halo, w, c),
        lambda b, i: (b, jnp.maximum(i * k - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    dn = pl.BlockSpec(
        (1, halo, w, c),
        lambda b, i: (b, jnp.minimum(i * k + k, h // halo - 1), 0, 0),
        memory_space=pltpu.VMEM)
    return mid, up, dn


def _relu_conv1(x2d, w1, b1, valid=None):
    """relu(x @ w1 + b1) → bf16; optionally zeroed (out-of-image halo)."""
    y = jnp.dot(x2d, w1, preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b1, 0.0)
    if valid is not None:
        y = jnp.where(valid, y, 0.0)
    return y.astype(jnp.bfloat16)


# ---------------------------------------------------------------- forward


def _fwd_kernel(x_up, x_mid, x_dn, w1, b1, w2, b2, w3, b3,
                out_ref, y1p, *, n_i: int):
    i = pl.program_id(1)
    th, w, c = x_mid.shape[1], x_mid.shape[2], x_mid.shape[3]
    m = w1.shape[1]

    # --- conv1 (1×1) + bias + relu on tile + halo rows → y1p (padded).
    y1p[:, 0:1, :] = jnp.zeros((th + 2, 1, m), jnp.bfloat16)
    y1p[:, w + 1:w + 2, :] = jnp.zeros((th + 2, 1, m), jnp.bfloat16)
    y1p[1:th + 1, 1:w + 1, :] = _relu_conv1(
        x_mid[0].reshape(th * w, c), w1[...], b1[...]).reshape(th, w, m)
    y1p[0:1, 1:w + 1, :] = _relu_conv1(
        x_up[0].reshape(w, c), w1[...], b1[...], valid=i > 0
    ).reshape(1, w, m)
    y1p[th + 1:th + 2, 1:w + 1, :] = _relu_conv1(
        x_dn[0].reshape(w, c), w1[...], b1[...], valid=i < n_i - 1
    ).reshape(1, w, m)

    # --- conv2 (3×3, pad 1) + bias + relu on the th tile rows.
    y1p_all = y1p[...]
    acc = jnp.zeros((th * w, m), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = jax.lax.slice(y1p_all, (ky, kx, 0), (ky + th, kx + w, m))
            acc = acc + jnp.dot(patch.reshape(th * w, m), w2[ky, kx],
                                preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2[...], 0.0).astype(jnp.bfloat16)

    # --- conv3 (1×1) + bias + residual + relu.
    y3 = jnp.dot(y2, w3[...], preferred_element_type=jnp.float32) + b3[...]
    resid = x_mid[0].reshape(th * w, c).astype(jnp.float32)
    out_ref[...] = jnp.maximum(y3 + resid, 0.0).astype(
        out_ref.dtype).reshape(1, th, w, c)


def _bottleneck_fwd(x, w1, b1, w2, b2, w3, b3, *, interpret=False):
    bsz, h, w, c = x.shape
    m = w1.shape[1]
    th = _pick_th(h, w, c, backward=False)
    mid, up, dn = _row_specs(h, th, w, c, halo=1)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = pl.pallas_call(
        functools.partial(_fwd_kernel, n_i=h // th),
        grid=(bsz, h // th),
        in_specs=[up, mid, dn, vmem(), vmem(), vmem(), vmem(), vmem(),
                  vmem()],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2, m), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    return kernel(x, x, x, w1, b1, w2, b2, w3, b3)


# --------------------------------------------------------------- backward


def _bwd_kernel(x_up, x_mid, x_dn, dy_up, dy_mid, dy_dn,
                w1, b1, w2, b2, w3, b3,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                y1p, dc2p, *, n_i: int):
    """Backward for tile rows [i·TH, i·TH+TH): recompute y1 (th+4 rows,
    x halo 2) and y2/dc2 (th+2 rows, dy halo 1), then one pass of grads."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    th, w, c = x_mid.shape[1], x_mid.shape[2], x_mid.shape[3]
    m = w1.shape[1]

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)

    # --- recompute y1 on th+4 rows (2-row halos; out-of-image → 0).
    y1p[:, 0:1, :] = jnp.zeros((th + 4, 1, m), jnp.bfloat16)
    y1p[:, w + 1:w + 2, :] = jnp.zeros((th + 4, 1, m), jnp.bfloat16)
    y1p[2:th + 2, 1:w + 1, :] = _relu_conv1(
        x_mid[0].reshape(th * w, c), w1[...], b1[...]).reshape(th, w, m)
    y1p[0:2, 1:w + 1, :] = _relu_conv1(
        x_up[0].reshape(2 * w, c), w1[...], b1[...], valid=i > 0
    ).reshape(2, w, m)
    y1p[th + 2:th + 4, 1:w + 1, :] = _relu_conv1(
        x_dn[0].reshape(2 * w, c), w1[...], b1[...], valid=i < n_i - 1
    ).reshape(2, w, m)
    y1p_all = y1p[...]

    # --- recompute y2 on th+2 rows (y1p rows 1..th+3).
    acc = jnp.zeros(((th + 2) * w, m), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            patch = jax.lax.slice(
                y1p_all, (ky, kx, 0), (ky + th + 2, kx + w, m))
            acc = acc + jnp.dot(patch.reshape((th + 2) * w, m), w2[ky, kx],
                                preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2[...], 0.0).astype(jnp.bfloat16)

    # --- dy slab (th+2 rows; out-of-image halos → 0) and the out mask.
    dy_top = jnp.where(i > 0, dy_up[0].astype(jnp.float32), 0.0)
    dy_bot = jnp.where(i < n_i - 1, dy_dn[0].astype(jnp.float32), 0.0)
    dy_slab = jnp.concatenate(
        [dy_top, dy_mid[0].astype(jnp.float32), dy_bot],
        axis=0).reshape((th + 2) * w, c)
    # resid on the same th+2 rows: x halo row r0-1 is x_up[0][1],
    # row r0+th is x_dn[0][0] (clamped garbage at the edges is masked by
    # dy_slab being zero there, so outpos on those rows is irrelevant).
    resid = jnp.concatenate(
        [x_up[0][1:2].astype(jnp.float32),
         x_mid[0].astype(jnp.float32),
         x_dn[0][0:1].astype(jnp.float32)], axis=0).reshape((th + 2) * w, c)
    y3 = jnp.dot(y2, w3[...], preferred_element_type=jnp.float32) + b3[...]
    dy3 = jnp.where((y3 + resid) > 0.0, dy_slab, 0.0)

    # --- conv3 backward.
    dy3b = dy3.astype(jnp.bfloat16)
    dc2 = jnp.dot(dy3b, w3[...].T, preferred_element_type=jnp.float32)
    dc2 = jnp.where(y2.astype(jnp.float32) > 0.0, dc2, 0.0)
    inter = slice(w, (th + 1) * w)  # interior th rows of the th+2 slab
    dw3_ref[...] += jax.lax.dot_general(
        y2[inter], dy3b[inter],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db3_ref[...] += jnp.sum(dy3[inter], axis=0, keepdims=True)

    # --- conv2 backward: transposed conv for dy1' + dW2/db2.
    dc2b = dc2.astype(jnp.bfloat16).reshape(th + 2, w, m)
    dc2p[:, 0:1, :] = jnp.zeros((th + 2, 1, m), jnp.bfloat16)
    dc2p[:, w + 1:w + 2, :] = jnp.zeros((th + 2, 1, m), jnp.bfloat16)
    dc2p[:, 1:w + 1, :] = dc2b
    dc2p_all = dc2p[...]
    dc2_int = dc2b[1:th + 1].reshape(th * w, m)
    dy1 = jnp.zeros((th * w, m), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            # dy1[t] += dc2[t − ky + 1] @ w2[ky,kx]ᵀ; dc2p row 0 is
            # absolute r0−1 → slice start (2−ky, 2−kx).
            patch = jax.lax.slice(
                dc2p_all, (2 - ky, 2 - kx, 0), (2 - ky + th, 2 - kx + w, m))
            dy1 = dy1 + jnp.dot(patch.reshape(th * w, m), w2[ky, kx].T,
                                preferred_element_type=jnp.float32)
            # dW2[ky,kx] += y1[t+ky−1, c+kx−1]ᵀ dc2[t, c]; y1p row 0 is
            # absolute r0−2 → row start 1+ky, col start kx.
            ypatch = jax.lax.slice(
                y1p_all, (1 + ky, kx, 0), (1 + ky + th, kx + w, m))
            dw2_ref[ky, kx] += jax.lax.dot_general(
                ypatch.reshape(th * w, m), dc2_int,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dc2[inter].astype(jnp.float32).reshape(th * w, m),
                            axis=0, keepdims=True)

    # --- conv1 backward (interior rows: y1p rows 2..th+2).
    y1_int = jax.lax.slice(
        y1p_all, (2, 1, 0), (2 + th, 1 + w, m)).reshape(th * w, m)
    dc1 = jnp.where(y1_int.astype(jnp.float32) > 0.0, dy1, 0.0)
    dc1b = dc1.astype(jnp.bfloat16)
    x_int = x_mid[0].reshape(th * w, c)
    dw1_ref[...] += jax.lax.dot_general(
        x_int, dc1b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dc1, axis=0, keepdims=True)

    # --- dx = residual-path grad + conv1-path grad.
    dx = dy3[inter] + jnp.dot(dc1b, w1[...].T,
                              preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype).reshape(1, th, w, c)


def _bottleneck_bwd(x, dy, w1, b1, w2, b2, w3, b3, *, interpret=False):
    bsz, h, w, c = x.shape
    m = w1.shape[1]
    th = _pick_th(h, w, c, backward=True)
    x_mid, x_up, x_dn = _row_specs(h, th, w, c, halo=2)
    dy_mid, dy_up, dy_dn = _row_specs(h, th, w, c, halo=1)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    const = lambda *_: (0, 0)
    const4 = lambda *_: (0, 0, 0, 0)
    kernel = pl.pallas_call(
        functools.partial(_bwd_kernel, n_i=h // th),
        grid=(bsz, h // th),
        in_specs=[x_up, x_mid, x_dn, dy_up, dy_mid, dy_dn,
                  vmem(), vmem(), vmem(), vmem(), vmem(), vmem()],
        out_specs=(
            pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, m, m), const4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, c), dy.dtype),
            jax.ShapeDtypeStruct((c, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, m, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((m, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 4, w + 2, m), jnp.bfloat16),
            pltpu.VMEM((th + 2, w + 2, m), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    return kernel(x, x, x, dy, dy, dy, w1, b1, w2, b2, w3, b3)


# ------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _bottleneck_op(x, w1, b1, w2, b2, w3, b3, interpret):
    return _bottleneck_fwd(x, w1, b1, w2, b2, w3, b3, interpret=interpret)


def _op_fwd(x, w1, b1, w2, b2, w3, b3, interpret):
    out = _bottleneck_fwd(x, w1, b1, w2, b2, w3, b3, interpret=interpret)
    return out, (x, w1, b1, w2, b2, w3, b3)


def _op_bwd(interpret, res, dy):
    x, w1, b1, w2, b2, w3, b3 = res
    dx, dw1, db1, dw2, db2, dw3, db3 = _bottleneck_bwd(
        x, dy, w1, b1, w2, b2, w3, b3, interpret=interpret)
    return (dx, dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype),
            dw3.astype(w3.dtype), db3.reshape(b3.shape).astype(b3.dtype))


_bottleneck_op.defvjp(_op_fwd, _op_bwd)


def bottleneck_identity(x: Array, w1: Array, b1: Array, w2: Array,
                        b2: Array, w3: Array, b3: Array,
                        interpret: Optional[bool] = None) -> Array:
    """Fused stride-1 identity bottleneck (BN pre-folded into w/b).

    x [B,H,W,C] bf16; w1 [C,M] bf16, w2 [3,3,M,M] bf16, w3 [M,C] bf16;
    biases fp32 [1, ·]. Returns [B,H,W,C] in x.dtype. Matches
    relu(conv3(relu(conv2(relu(conv1(x))))) + x) with fp32 accumulation
    (oracle: :func:`bottleneck_identity_reference`, within one bf16 ulp);
    differentiable via a recompute-based Pallas backward.
    """
    if interpret is None:
        interpret = not pallas_available()
    return _bottleneck_op(x, w1, b1, w2, b2, w3, b3, interpret)


def bottleneck_identity_reference(x, w1, b1, w2, b2, w3, b3):
    """lax oracle with the same math: fp32 convs, bf16 rounding at the
    points where the kernel stores bf16 (y1, y2, out). Differentiable."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

    def conv(v, w, k):
        return jax.lax.conv_general_dilated(
            v, w.reshape(k, k, w.shape[-2], w.shape[-1]).astype(jnp.float32),
            (1, 1), [(k // 2, k // 2)] * 2, dimension_numbers=dn)

    xf = x.astype(jnp.float32)
    y1 = jnp.maximum(conv(xf, w1[None, None], 1) + b1.reshape(-1), 0.0)
    y1 = y1.astype(jnp.bfloat16).astype(jnp.float32)
    y2 = jnp.maximum(conv(y1, w2, 3) + b2.reshape(-1), 0.0)
    y2 = y2.astype(jnp.bfloat16).astype(jnp.float32)
    y3 = conv(y2, w3[None, None], 1) + b3.reshape(-1)
    return jnp.maximum(y3 + xf, 0.0).astype(x.dtype)
