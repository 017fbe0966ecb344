#!/usr/bin/env python
"""Per-shape conv-backward profiling for the layer1/layer2 campaign
(VERDICT r2 next-round #1).

The region profile says layer1+layer2 run 28.0 ms vs ~14 ms roofline.
Before writing dedicated dW/dX Pallas kernels, measure where XLA actually
loses it, per conv shape and per gradient:

  for each (H, W, Cin, Cout, k, stride) in the layer1/layer2 inventory:
    fwd / dX only / dW only / dX+dW, plus dot-form alternatives for the
    1x1 shapes (the same contraction as a plain matmul — is XLA's conv
    lowering or its matmul lowering faster at these m=64 shapes?).

Measurement method (this box): per-call dispatch through the axon tunnel
costs ~2-3 ms, swamping sub-ms kernels — so each op is CHAINED N times
inside one jit via a scalar data dependency (out -> 0-weighted scalar ->
next input), one dispatch total, minus an empty-chain baseline. The
scalar add fuses into the conv's input read; cross-check: fwd times match
the region profile's per-conv shares.

Prints ms and roofline bounds (v5e: 197 TFLOP/s bf16, 819 GB/s HBM).
Run on the real chip: python scripts/profile_conv_bwd.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MXU = 197e12
HBM = 819e9
B = 16


def chain_time(op, seed_inputs, n=16, reps=3):
    """Time ``op(*seed_inputs)`` chained n times in ONE jit dispatch.

    ``op`` maps its first arg's shape to anything; a 0-weighted scalar of
    each output feeds the next iteration's first input, serializing the n
    kernels without changing the math (the add fuses into the input read).
    Returns ms per op.
    """
    import jax
    import jax.numpy as jnp

    first, rest = seed_inputs[0], seed_inputs[1:]

    @jax.jit
    def run(first, rest):
        def body(carry, _):
            out = op(carry, *rest)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l[(0,) * l.ndim]).astype(jnp.float32)
                    for l in leaves)
            # non-foldable coupling: a *0.0 scale lets XLA fold the carry
            # update, DCE the op, and collapse the chain; 1e-38 keeps a
            # real data dependence while perturbing bf16 inputs by nothing
            nxt = carry + (s * 1e-38).astype(carry.dtype)
            return nxt, None
        final, _ = jax.lax.scan(body, first, None, length=n)
        return jnp.sum(final[(0,) * final.ndim])

    float(np.asarray(run(first, rest)))  # compile + first-call stall
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(run(first, rest)))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3


def empty_baseline(x, n=16, reps=3):
    """Chain overhead: same scan, identity op (scalar coupling only)."""
    return chain_time(lambda c: c[:1, :1, :1, :1], (x,), n=n, reps=reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # (name, Hin, Win, Cin, Cout, k, stride) — every distinct conv in
    # layer1+layer2 of R50-640 (identity blocks dominate: xN)
    shapes = [
        ("l1.conv1 x3", 160, 160, 256, 64, 1, 1),
        ("l1.conv2 x3", 160, 160, 64, 64, 3, 1),
        ("l1.conv3 x3", 160, 160, 64, 256, 1, 1),
        ("l2.conv1 x4", 80, 80, 512, 128, 1, 1),
        ("l2.conv2 x4", 80, 80, 128, 128, 3, 1),
        ("l2.conv3 x4", 80, 80, 128, 512, 1, 1),
        ("l2.b0 c2 s2", 160, 160, 128, 128, 3, 2),
        ("l2.b0 pj s2", 160, 160, 256, 512, 1, 2),
    ]

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(8))  # absorb the cold-tunnel D2H stall up front
    print(f"tunnel warm ({time.perf_counter() - t0:.0f} s)", flush=True)
    base_x = jnp.asarray(rng.normal(0, 1, (B, 160, 160, 64)), jnp.bfloat16)
    overhead = empty_baseline(base_x, n=args.n)
    print(f"chain overhead per slot: {overhead:.3f} ms")
    print(f"{'shape':>12} {'what':>7} {'ms':>7} {'t_mxu':>6} {'t_hbm':>6} "
          f"{'roofl%':>6}")

    for name, hin, win, cin, cout, k, stride in shapes:
        hout, wout = hin // stride, win // stride
        x = jnp.asarray(rng.normal(0, 1, (B, hin, win, cin)), jnp.bfloat16)
        wt = jnp.asarray(rng.normal(0, 0.05, (k, k, cin, cout)), jnp.bfloat16)
        dy = jnp.asarray(rng.normal(0, 1, (B, hout, wout, cout)),
                         jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, wt.shape, ("NHWC", "HWIO", "NHWC"))
        pad = [(k // 2, k // 2)] * 2

        def conv(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, (stride, stride), pad, dimension_numbers=dn)

        def dx_of(dy_):
            return jax.vjp(lambda x_: conv(x_, wt), x)[1](dy_)[0]

        def dw_of(dy_):
            return jax.vjp(lambda w_: conv(x, w_), wt)[1](dy_)[0]

        def both_of(dy_):
            return jax.vjp(conv, x, wt)[1](dy_)

        flops = 2 * B * hout * wout * cin * cout * k * k
        bx, bw, by = x.size * 2, wt.size * 2, dy.size * 2

        rows = [
            ("fwd", lambda c: conv(c, wt), (x,), flops, bx + bw + by),
            ("dx", lambda c: dx_of(c), (dy,), flops, by + bw + bx),
            ("dw", lambda c: dw_of(c), (dy,), flops, bx + by + bw),
            ("dx+dw", lambda c: both_of(c), (dy,), 2 * flops,
             bx + 2 * by + bw + bx),
        ]
        for what, op, seeds, fl, bts in rows:
            ms = max(chain_time(op, seeds, n=args.n) - overhead, 1e-3)
            t_mxu = fl / MXU * 1e3
            t_hbm = bts / HBM * 1e3
            ideal = max(t_mxu, t_hbm)
            print(f"{name:>12} {what:>7} {ms:7.3f} {t_mxu:6.3f} "
                  f"{t_hbm:6.3f} {100 * ideal / ms:5.0f}%", flush=True)

        # dot-form alternatives for stride-1 1x1 shapes: identical
        # contraction as a plain matmul over [B*H*W, C]
        if k == 1 and stride == 1:
            x2 = x.reshape(-1, cin)
            dy2 = dy.reshape(-1, cout)
            w2 = wt.reshape(cin, cout)
            ms_dx = chain_time(
                lambda d: jnp.dot(d, w2.T), (dy2,), n=args.n) - overhead
            ms_dw = chain_time(
                lambda d: jax.lax.dot_general(
                    x2, d, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32),
                (dy2,), n=args.n) - overhead
            print(f"{name:>12} {'dot-dx':>7} {ms_dx:7.3f}")
            print(f"{name:>12} {'dot-dw':>7} {ms_dw:7.3f}", flush=True)

    # calibration: a whole layer1 identity block fwd+bwd, whose IN-STEP
    # truth is known (~5.9 ms/block from the region profile) — gauges how
    # pessimistic the isolated chain harness is vs in-graph fusion
    from detjax.kernels.bottleneck import bottleneck_identity_reference

    c, m = 256, 64
    x = jnp.asarray(rng.normal(0, 1, (B, 160, 160, c)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(0, 1, (B, 160, 160, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (c, m)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, m, m)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(0, 0.05, (m, c)), jnp.bfloat16)
    b1 = jnp.zeros((1, m), jnp.float32)
    b2 = jnp.zeros((1, m), jnp.float32)
    b3 = jnp.zeros((1, c), jnp.float32)

    def blk(x_, w1_, w2_, w3_):
        return bottleneck_identity_reference(x_, w1_, b1, w2_, b2, w3_, b3)

    ms_f = chain_time(lambda c_: blk(c_, w1, w2, w3), (x,), n=args.n) \
        - overhead
    ms_b = chain_time(
        lambda d: jax.vjp(blk, x, w1, w2, w3)[1](d), (dy,),
        n=args.n) - overhead
    print(f"{'l1 idblock':>12} {'fwd':>7} {ms_f:7.3f}   (in-step truth "
          "fwd+bwd ≈ 5.9 ms)")
    print(f"{'l1 idblock':>12} {'bwd':>7} {ms_b:7.3f}", flush=True)


if __name__ == "__main__":
    main()
