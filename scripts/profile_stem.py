#!/usr/bin/env python
"""Micro-profile the R50 stem (conv7x7s2 + frozen-BN + relu + maxpool3x3s2)
at [16, 640, 640, 3] to locate the slow piece before writing a kernel.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, args, iters=20, rounds=3):
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


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    B, H, W = 16, 640, 640
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)

    def bnrelu(y):
        return jax.nn.relu(y * 1.01 + 0.02)

    def pool(z):
        return lax.reduce_window(z, -jnp.inf, lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1),
                                                (0, 0)])

    t = timeit(jax.jit(conv), (x, w))
    print(f"conv fwd:              {t * 1e3:7.2f} ms", flush=True)

    stem = jax.jit(lambda x, w: pool(bnrelu(conv(x, w))))
    t = timeit(stem, (x, w))
    print(f"stem fwd:              {t * 1e3:7.2f} ms", flush=True)

    z = jnp.asarray(rng.normal(0, 1, (B, 320, 320, 64)), jnp.bfloat16)
    pb = jax.jit(jax.grad(lambda z: pool(z.astype(jnp.float32)).sum()))
    t = timeit(pb, (z,))
    print(f"maxpool fwd+bwd:       {t * 1e3:7.2f} ms", flush=True)

    cw = jax.jit(jax.grad(
        lambda w, x: conv(x, w).astype(jnp.float32).sum(), argnums=0))
    t = timeit(cw, (w, x))
    print(f"conv fwd+dW:           {t * 1e3:7.2f} ms", flush=True)

    full = jax.jit(jax.grad(
        lambda w, x: pool(bnrelu(conv(x, w))).astype(jnp.float32).sum(),
        argnums=0))
    t = timeit(full, (w, x))
    print(f"stem fwd+bwd(dW):      {t * 1e3:7.2f} ms", flush=True)

    # dz-only backward (pool+bnrelu, no conv grad) — the piece a fused
    # backward kernel would replace
    dzb = jax.jit(jax.grad(
        lambda z: pool(bnrelu(z.astype(jnp.float32))).sum()))
    t = timeit(dzb, (z,))
    print(f"bnrelu+pool fwd+bwd:   {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
