#!/usr/bin/env python
"""Int8 PTQ inference vs bf16 on the real chip (detjax/quant.py).

Also home of the micro-benchmark evidence: chained 3×3×256 convs at head
shapes run 1.4–1.5× faster as s8×s8→s32 incl. requantization (v5e int8
MXU is 2× bf16; requant VPU work eats part of it).

Timing protocol (memory: axon tunnel): handle-only loops, throwaway
round, min of rounds, force via np.asarray.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, args, iters=20, rounds=3):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for r in range(rounds):
        o = None
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / iters
        if r > 0:
            best = min(best, dt)
    return best


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from detjax import quant
    from detjax.config import get_config
    from detjax.modeling import _detect_fn, build_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="*", default=None, metavar="PRESET:BS",
                    help="e.g. retinanet_r50_640:16 retinanet_r50_640:32 "
                         "retinanet_r50_640_latency:1 (default: the three "
                         "headline rows)")
    args = ap.parse_args()
    runs = ([(s.rsplit(":", 1)[0], int(s.rsplit(":", 1)[1]))
             for s in args.runs] if args.runs else
            [("retinanet_r50_640", 8), ("retinanet_r50_640", 1),
             ("ssd_512", 8)])

    rng = np.random.default_rng(0)
    for preset, bs in runs:
        cfg = get_config(preset)
        h, w = cfg.model.image_size
        images = jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32)
        module, variables = build_model(cfg, jax.random.PRNGKey(0))

        t_bf = bench(lambda v, x: _detect_fn(cfg)(v, x).scores,
                     (variables, images))

        qtree = quant.quantize_model(variables, cfg, images)
        t_i8 = bench(lambda q, x: quant.detect_int8(q, x, cfg).scores,
                     (qtree, images))
        print(json.dumps({
            "preset": preset, "bs": bs,
            "bf16_ms": round(t_bf * 1e3, 2),
            "int8_ms": round(t_i8 * 1e3, 2),
            "bf16_img_s": round(bs / t_bf, 1),
            "int8_img_s": round(bs / t_i8, 1),
            "speedup": round(t_bf / t_i8, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
