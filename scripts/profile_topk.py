#!/usr/bin/env python
"""Top-k lowering experiment for the detect candidate selection.

The bs=8 inference trace (docs/ROOFLINE.md round-3 inference section)
shows the two `lax.top_k` calls in ops/nms._select_candidates lowering
to full variadic sorts — 0.79 + 0.69 ms of the 16.5 ms step. TPU has a
PartialReduce-based top-k (`lax.approx_max_k`) that is exact when
`recall_target=1.0`; this script times both lowerings at the production
shapes and checks result equality INCLUDING tie order (lax.top_k
guarantees lowest-index-first on ties; the candidate-selection oracle
tests depend on it).

Run on the TPU (default python).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(1))  # pre-warm device readback

    rng = np.random.default_rng(0)
    # Production shapes: stage 1 ranks [A]=76725 best-per-anchor scores;
    # stage 2 ranks the [1000*K]=80000 candidate slab. k=1000 both times.
    shapes = (("stage1 [76725]", 76725, 1000), ("stage2 [80000]", 80000, 1000))

    for name, nvals, k in shapes:
        # bf16-quantized values create heavy ties (the production logits
        # are bf16 casts) — the hard case for tie-order agreement.
        base = rng.normal(-3, 2.5, nvals).astype(np.float32)
        vals = jnp.asarray(base).astype(jnp.bfloat16).astype(jnp.float32)

        @jax.jit
        def exact(v):
            return jax.lax.top_k(v, k)

        @partial(jax.jit, static_argnames="recall")
        def approx(v, recall=1.0):
            return jax.lax.approx_max_k(v, k, recall_target=recall)

        ev, ei = jax.tree.map(np.asarray, exact(vals))
        for recall in (1.0, 0.95):
            av, ai = jax.tree.map(np.asarray, approx(vals, recall=recall))
            val_eq = bool((ev == av).all())
            idx_eq = bool((ei == ai).all())
            n_val_diff = int((ev != av).sum())
            n_idx_diff = int((ei != ai).sum())
            print(f"{name} recall={recall}: values_equal={val_eq} "
                  f"({n_val_diff} diff) tie_order_equal={idx_eq} "
                  f"({n_idx_diff} diff)", flush=True)

        def timed(fn, *args, iters=200):
            def _round(n):
                outs = []
                t0 = time.perf_counter()
                for _ in range(n):
                    outs.append(fn(*args)[0])
                float(np.asarray(jnp.stack([o[0] for o in outs]).sum()))
                return (time.perf_counter() - t0) / n
            _round(20)
            return min(_round(iters), _round(iters))

        t_exact = timed(exact, vals)
        t_a100 = timed(lambda v: approx(v, recall=1.0), vals)
        t_a95 = timed(lambda v: approx(v, recall=0.95), vals)
        print(f"{name}: top_k {t_exact * 1e3:.3f} ms | approx(1.0) "
              f"{t_a100 * 1e3:.3f} ms | approx(0.95) {t_a95 * 1e3:.3f} ms",
              flush=True)

    # vmapped over batch 8 (the production call is inside a vmap)
    vals8 = jnp.asarray(
        rng.normal(-3, 2.5, (8, 76725)).astype(np.float32))

    @jax.jit
    def exact8(v):
        return jax.lax.top_k(v, 1000)

    @jax.jit
    def approx8(v):
        return jax.lax.approx_max_k(v, 1000, recall_target=1.0)

    def timed8(fn):
        def _round(n):
            outs = []
            t0 = time.perf_counter()
            for _ in range(n):
                outs.append(fn(vals8)[0])
            float(np.asarray(jnp.stack([o[0, 0] for o in outs]).sum()))
            return (time.perf_counter() - t0) / n
        _round(20)
        return min(_round(100), _round(100))

    print(f"batch8 [8,76725]: top_k {timed8(exact8) * 1e3:.3f} ms | "
          f"approx(1.0) {timed8(approx8) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
