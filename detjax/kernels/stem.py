"""Stem max-pool (3×3, stride 2, pad 1) with a Pallas backward.

XLA lowers the max-pool gradient to SelectAndScatter, which measures
~6 ms fwd+bwd at the R50-640/bs16 stem shape ([16,320,320,64]) — ~7× the
HBM roofline and the single largest fixed cost in the stem
(scripts/profile_stem.py). The forward stays on XLA's reduce_window
(fast); the backward is ONE Pallas pass that recomputes each window's max
and routes dp to the FIRST max position in window scan order — exactly
SelectAndScatter's tie-breaking, so routing matches XLA's bit for bit on
the same inputs.

Stride-2 window geometry is handled by PHASE DECOMPOSITION: Mosaic has no
stride-2 vector slices, so z is split outside the kernel into its four
(row, col)-parity planes z[2i+a, 2j+b] (one XLA relayout each way, ~0.5 ms
round trip at the stem shape) and every window tap becomes a unit-stride
slice of one plane; dz is emitted as four parity planes and interleaved
back outside. Halos arrive as clamped BlockSpec windows (see
kernels/bottleneck.py for the pattern).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def max_pool_3x3s2_reference(z: Array) -> Array:
    """XLA forward: reduce_window max, window 3×3, stride 2, pad 1."""
    init = np.array(-np.inf, jax.dtypes.canonicalize_dtype(z.dtype))
    return jax.lax.reduce_window(
        z, init, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _split_phases(z: Array):
    """[B, 2H, 2W, C] → (p00, p01, p10, p11), pab[i, j] = z[2i+a, 2j+b]."""
    b, h2, w2, c = z.shape
    h, w = h2 // 2, w2 // 2
    v = z.reshape(b, h, 2, w, 2, c)
    return (v[:, :, 0, :, 0], v[:, :, 0, :, 1],
            v[:, :, 1, :, 0], v[:, :, 1, :, 1])


def _merge_phases(p00, p01, p10, p11):
    b, h, w, c = p00.shape
    rows0 = jnp.stack([p00, p01], axis=3).reshape(b, h, 2 * w, c)
    rows1 = jnp.stack([p10, p11], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([rows0, rows1], axis=2).reshape(b, 2 * h, 2 * w, c)


def _bwd_kernel(p00u, p00, p01u, p01, p10u, p10d, p10, p11u, p11d, p11,
                dp_mid, dp_dn,
                d00_ref, d01_ref, d10_ref, d11_ref,
                q00, q01, q10, q11, *, n_i: int):
    """Tile of TH output rows. q-buffers hold each phase with the halo
    rows/col the 9 taps need; all window taps are unit-stride slices."""
    i = pl.program_id(1)
    th = dp_mid.shape[1]
    w = dp_mid.shape[2]
    c = dp_mid.shape[3]
    neg = jnp.array(-jnp.inf, p00.dtype)
    first = i > 0
    last = i < n_i - 1

    # --- assemble phase slabs (left col pad = −inf for b=1 phases).
    # a=0 phases: rows [r0, r0+th] (mid + 1 bottom halo row from *u=dn).
    q00[0:th, :, :] = p00[0]
    q00[th:th + 1, :, :] = jnp.where(last, p00u[0], neg)
    q01[:, 0:1, :] = jnp.full((th + 1, 1, c), neg, p01.dtype)
    q01[0:th, 1:w + 1, :] = p01[0]
    q01[th:th + 1, 1:w + 1, :] = jnp.where(last, p01u[0], neg)
    # a=1 phases: rows [r0-1, r0+th] (1 top halo + mid + 1 bottom halo).
    q10[0:1, :, :] = jnp.where(first, p10u[0], neg)
    q10[1:th + 1, :, :] = p10[0]
    q10[th + 1:th + 2, :, :] = jnp.where(last, p10d[0], neg)
    q11[:, 0:1, :] = jnp.full((th + 2, 1, c), neg, p11.dtype)
    q11[0:1, 1:w + 1, :] = jnp.where(first, p11u[0], neg)
    q11[1:th + 1, 1:w + 1, :] = p11[0]
    q11[th + 1:th + 2, 1:w + 1, :] = jnp.where(last, p11d[0], neg)

    a00, a01 = q00[...], q01[...]
    a10, a11 = q10[...], q11[...]

    dp_bot = jnp.where(last, dp_dn[0].astype(jnp.float32), 0.0)
    dp_slab = jnp.concatenate(
        [dp_mid[0].astype(jnp.float32), dp_bot], axis=0)  # [th+1, w, c]

    # the 9 window taps in scan order (δ, ε) — z[2r+δ−1, 2c+ε−1]:
    # δ: 0→(a=1, row k=r of q1*), 1→(a=0, k=r), 2→(a=1, k=r+1)
    # ε: 0→(b=1, padded col j=c), 1→(b=0, j=c), 2→(b=1, padded col j=c+1)
    def tap(d, e):
        if d == 0:
            buf, r0_ = (a11, 0) if e != 1 else (a10, 0)
        elif d == 1:
            buf, r0_ = (a01, 0) if e != 1 else (a00, 0)
        else:
            buf, r0_ = (a11, 1) if e != 1 else (a10, 1)
        c0_ = {0: 0, 1: 0, 2: 1}[e]
        # compare in f32: the VPU has no bf16 equality, and bf16→f32 is
        # exact so first-match routing is unchanged
        return jax.lax.slice(buf, (r0_, c0_, 0),
                             (r0_ + th + 1, c0_ + w, c)).astype(jnp.float32)

    taps = [(d, e) for d in range(3) for e in range(3)]
    m = tap(0, 0)
    for d, e in taps[1:]:
        m = jnp.maximum(m, tap(d, e))

    # first-match routing into the 4 dz parity planes
    acc = {(a, b): jnp.zeros((th, w, c), jnp.float32)
           for a in range(2) for b in range(2)}
    taken = jnp.zeros((th + 1, w, c), jnp.bool_)
    zero_col = jnp.zeros((th, 1, c), jnp.float32)
    for d, e in taps:
        t = tap(d, e)
        eq = (t == m) & jnp.logical_not(taken)
        taken = taken | eq
        contrib = jnp.where(eq, dp_slab, 0.0)  # [th+1, w, c]
        # dz row 2r+δ−1 → parity ((δ−1) & 1) at k = r + (δ−1 == 1)… i.e.
        # δ=1→(0, k=r); δ=0→(1, k=r−1, so take rows 1:); δ=2→(1, k=r)
        if d == 1:
            rows, a = contrib[0:th], 0
        elif d == 0:
            rows, a = contrib[1:th + 1], 1
        else:
            rows, a = contrib[0:th], 1
        # dz col 2c+ε−1 → parity/col shift analogously
        if e == 1:
            acc[(a, 0)] = acc[(a, 0)] + rows
        elif e == 0:
            acc[(a, 1)] = acc[(a, 1)] + jnp.concatenate(
                [rows[:, 1:w, :], zero_col], axis=1)
        else:
            acc[(a, 1)] = acc[(a, 1)] + rows

    dt = d00_ref.dtype
    d00_ref[...] = acc[(0, 0)].astype(dt).reshape(1, th, w, c)
    d01_ref[...] = acc[(0, 1)].astype(dt).reshape(1, th, w, c)
    d10_ref[...] = acc[(1, 0)].astype(dt).reshape(1, th, w, c)
    d11_ref[...] = acc[(1, 1)].astype(dt).reshape(1, th, w, c)


def _pick_th(h_out: int, w_out: int) -> int:
    best = 0
    for th in range(2, h_out + 1, 2):
        if h_out % th == 0 and th * w_out <= 2560:
            best = th
    return best or (2 if h_out % 2 == 0 else h_out)


def _maxpool_bwd(z: Array, dp: Array, *, interpret=False) -> Array:
    bsz, hz, wz, c = z.shape
    h, w = hz // 2, wz // 2
    th = _pick_th(h, w)
    n_i = h // th
    p00, p01, p10, p11 = _split_phases(z)
    vm = pltpu.VMEM
    mid = lambda: pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=vm)
    up = lambda: pl.BlockSpec(
        (1, 1, w, c), lambda b, i: (b, jnp.maximum(i * th - 1, 0), 0, 0),
        memory_space=vm)
    dn = lambda: pl.BlockSpec(
        (1, 1, w, c), lambda b, i: (b, jnp.minimum(i * th + th, h - 1), 0, 0),
        memory_space=vm)
    out = jax.ShapeDtypeStruct((bsz, h, w, c), dp.dtype)
    kernel = pl.pallas_call(
        functools.partial(_bwd_kernel, n_i=n_i),
        grid=(bsz, n_i),
        in_specs=[dn(), mid(),           # p00: bottom halo + mid
                  dn(), mid(),           # p01
                  up(), dn(), mid(),     # p10: top + bottom halos + mid
                  up(), dn(), mid(),     # p11
                  mid(), dn()],          # dp: mid + bottom halo
        out_specs=(mid(), mid(), mid(), mid()),
        out_shape=(out, out, out, out),
        scratch_shapes=[
            pltpu.VMEM((th + 1, w, c), z.dtype),
            pltpu.VMEM((th + 1, w + 1, c), z.dtype),
            pltpu.VMEM((th + 2, w, c), z.dtype),
            pltpu.VMEM((th + 2, w + 1, c), z.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    d00, d01, d10, d11 = kernel(p00, p00, p01, p01, p10, p10, p10,
                                p11, p11, p11, dp, dp)
    return _merge_phases(d00, d01, d10, d11)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool_op(z, interpret):
    return max_pool_3x3s2_reference(z)


def _pool_fwd(z, interpret):
    return max_pool_3x3s2_reference(z), z


def _pool_bwd(interpret, z, dp):
    return (_maxpool_bwd(z, dp, interpret=interpret),)


_pool_op.defvjp(_pool_fwd, _pool_bwd)


def max_pool_3x3s2(z: Array, interpret: Optional[bool] = None) -> Array:
    """3×3/s2/p1 max pool: XLA reduce_window forward, Pallas backward.

    Gradient routing matches XLA SelectAndScatter (first max in window
    scan order) exactly — see tests/test_kernels.py.
    """
    if interpret is None:
        interpret = not pallas_available()
    return _pool_op(z, interpret)
