#!/usr/bin/env python
"""Fused Pallas bottleneck vs XLA unfused: fwd+bwd time at each stage's
shape (bs=16, 640px flagship). Run on the real chip."""

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

    from detjax.kernels.bottleneck import (bottleneck_identity,
                                           bottleneck_identity_reference)

    rng = np.random.default_rng(0)
    B = 16
    shapes = [  # (name, H, W, C) at 640px input
        ("layer1", 160, 160, 256),
        ("layer2", 80, 80, 512),
        ("layer3", 40, 40, 1024),
        ("layer4", 20, 20, 2048),
    ]
    for name, h, w, c in shapes:
        m = c // 4
        x = jnp.asarray(rng.normal(0, 1, (B, h, w, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.05, (c, m)), jnp.bfloat16)
        b1 = jnp.asarray(rng.normal(0, 0.05, (1, m)), jnp.float32)
        w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, m, m)), jnp.bfloat16)
        b2 = jnp.asarray(rng.normal(0, 0.05, (1, m)), jnp.float32)
        w3 = jnp.asarray(rng.normal(0, 0.05, (m, c)), jnp.bfloat16)
        b3 = jnp.asarray(rng.normal(0, 0.05, (1, c)), jnp.float32)
        args = (x, w1, b1, w2, b2, w3, b3)

        def xla_bf16(x, w1, b1, w2, b2, w3, b3):
            # what the unfused model path actually runs: bf16 convs
            dn = jax.lax.conv_dimension_numbers(
                x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

            def conv(v, wt, k):
                return jax.lax.conv_general_dilated(
                    v, wt.reshape(k, k, wt.shape[-2], wt.shape[-1]), (1, 1),
                    [(k // 2, k // 2)] * 2, dimension_numbers=dn)

            y1 = jax.nn.relu(conv(x, w1[None, None], 1)
                             + b1.reshape(-1).astype(jnp.bfloat16))
            y2 = jax.nn.relu(conv(y1, w2, 3)
                             + b2.reshape(-1).astype(jnp.bfloat16))
            y3 = conv(y2, w3[None, None], 1)
            return jax.nn.relu(y3 + b3.reshape(-1).astype(jnp.bfloat16) + x)

        for label, fn in (("fused", bottleneck_identity),
                          ("xla16", xla_bf16),
                          ("xla32", bottleneck_identity_reference)):
            def fb(a, _fn=fn):
                def loss(a):
                    return jnp.sum(_fn(*a).astype(jnp.float32))

                return jax.grad(loss)(a)

            try:
                t = timeit(jax.jit(fb), (args,))
                print(f"{name} {label} fwd+bwd: {t * 1e3:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label} FAIL: {str(e)[:200]}", flush=True)

        # numerics on-chip
        try:
            a1 = np.asarray(jax.jit(bottleneck_identity)(*args),
                            np.float32)
            a2 = np.asarray(jax.jit(bottleneck_identity_reference)(*args),
                            np.float32)
            print(f"{name} max|Δ| = {np.abs(a1 - a2).max():.5f} "
                  f"(scale {np.abs(a2).max():.2f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} numerics FAIL: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
