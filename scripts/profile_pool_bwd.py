#!/usr/bin/env python
"""A/B the stem maxpool backward: XLA SelectAndScatter (native nn.max_pool
grad, ~7x off roofline — docs/ROOFLINE.md) vs a gather-form custom VJP
(argmax residual + 9 dilated-pad adds, pure HLO, no Pallas).

VERDICT (2026-08-17, v5e, [16,320,320,64] bf16): the gather form LOSES by
an order of magnitude — stride-2 ``lax.slice`` is as hostile to XLA:TPU's
layout engine as it was to Mosaic (ROADMAP round-2 verdict 3):

    native fwd:           2.52 ms     gather fwd:          31.20 ms
    native fwd+bwd:       4.77 ms     gather fwd+bwd:      69.07 ms
    stem fwd+dW native:   7.26 ms     stem fwd+dW gather:  55.45 ms

Routing is exact (CPU diff: only 1-ulp summation-order noise), so the
formulation is correct — the hardware simply has no fast path for
stride-2 window slicing outside the fused pooling emitters. XLA's
SelectAndScatter stays on the hot path; the stem's ~8.5 ms roofline gap
(docs/ROOFLINE.md) remains unclaimed by three independent attempts
(Pallas phase-decomposition, space-to-depth, HLO gather-form).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, args, iters=30, rounds=3):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for r in range(rounds):
        outs = []
        t0 = time.perf_counter()
        for _ in range(iters):
            outs.append(f(*args))
        np.asarray(jax.tree.leaves(outs[-1])[0].reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / iters
        if r > 0:
            best = min(best, dt)
    return best


def make_gather_pool():
    """Gather-form max pool 3x3/s2/pad1 with first-tie argmax backward."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def _window_patches(z):
        b, h, w, c = z.shape
        ho, wo = h // 2, w // 2
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=jnp.finfo(z.dtype).min)
        return [lax.slice(zp, (0, ky, kx, 0),
                          (b, ky + 2 * ho - 1, kx + 2 * wo - 1, c),
                          (1, 2, 2, 1))
                for ky in range(3) for kx in range(3)]

    @jax.custom_vjp
    def pool(z):
        patches = _window_patches(z)
        out = patches[0]
        for p in patches[1:]:
            out = jnp.maximum(out, p)
        return out

    def _fwd(z):
        patches = _window_patches(z)
        out = patches[0]
        for p in patches[1:]:
            out = jnp.maximum(out, p)
        argm = jnp.full(out.shape, 8, jnp.int8)
        for k in reversed(range(9)):  # k=0 wins ties (first-GE semantics)
            argm = jnp.where(patches[k] == out, jnp.int8(k), argm)
        return out, argm

    def _bwd(argm, ct):
        ho, wo = ct.shape[1], ct.shape[2]
        h, w = 2 * ho, 2 * wo
        total = None
        for k in range(9):
            ky, kx = divmod(k, 3)
            contrib = jnp.where(argm == k, ct, jnp.zeros_like(ct))
            d = lax.pad(contrib, jnp.zeros((), ct.dtype),
                        ((0, 0, 0),
                         (ky, (h + 2) - (2 * ho - 1) - ky, 1),
                         (kx, (w + 2) - (2 * wo - 1) - kx, 1),
                         (0, 0, 0)))
            total = d if total is None else total + d
        return (total[:, 1:h + 1, 1:w + 1, :],)

    pool.defvjp(_fwd, _bwd)
    return pool


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    gather_pool = make_gather_pool()

    rng = np.random.default_rng(0)
    B, H, W, C = 16, 320, 320, 64
    # relu'd activations: many exact zeros → real tie traffic
    z = jnp.asarray(np.maximum(rng.normal(0, 1, (B, H, W, C)), 0.0),
                    jnp.bfloat16)

    def native(z):
        return nn.max_pool(z, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    f_nat = jax.jit(native)
    f_new = jax.jit(gather_pool)
    np.testing.assert_array_equal(np.asarray(f_nat(z)), np.asarray(f_new(z)))
    ct = jnp.asarray(rng.normal(0, 1, f_nat(z).shape), jnp.bfloat16)
    g_nat = jax.jit(lambda z: jax.vjp(native, z)[1](ct)[0])
    g_new = jax.jit(lambda z: jax.vjp(gather_pool, z)[1](ct)[0])
    a, b = np.asarray(g_nat(z), np.float32), np.asarray(g_new(z), np.float32)
    print("bwd allclose:", np.allclose(a, b), "max|d|:", np.abs(a - b).max(),
          f"mismatched: {(a != b).sum()}/{a.size}")

    print(f"native fwd:        {timeit(f_nat, (z,)) * 1e3:7.2f} ms")
    print(f"gather fwd:        {timeit(f_new, (z,)) * 1e3:7.2f} ms")
    print(f"native fwd+bwd:    {timeit(g_nat, (z,)) * 1e3:7.2f} ms")
    print(f"gather fwd+bwd:    {timeit(g_new, (z,)) * 1e3:7.2f} ms")

    x = jnp.asarray(rng.normal(0, 1, (B, 640, 640, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def stem(w, x, pool):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)
        return pool(jax.nn.relu(y * 1.01 + 0.02)).astype(jnp.float32).sum()

    s_nat = jax.jit(jax.grad(lambda w, x: stem(w, x, native)))
    s_new = jax.jit(jax.grad(lambda w, x: stem(w, x, gather_pool)))
    print(f"stem fwd+dW native:{timeit(s_nat, (w, x)) * 1e3:7.2f} ms")
    print(f"stem fwd+dW gather:{timeit(s_new, (w, x)) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
