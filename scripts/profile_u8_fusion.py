#!/usr/bin/env python
"""A/B: fused normalize+detect over uint8 (one jit region) vs the split
normalize-jit + detect-jit path it replaces on the serving/eval paths
(detjax/modeling.detect_u8, quant.detect_int8_u8).

The fused path's claimed wins (modeling._detect_u8_fn docstring):
  * uint8 H2D is 4x fewer bytes than fp32 (host-feed case),
  * the normalized batch never materializes in HBM at a jit boundary,
  * one dispatch instead of two.
Device-resident inputs here isolate the last two (the tunnel hides
nothing device-side).

Timing protocol (memory: axon tunnel): handle-only loops, throwaway
round after compile, min of rounds, force via np.asarray.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, iters=20, rounds=3):
    import jax

    out = fn()
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for r in range(rounds + 1):
        o = None
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn()
        np.asarray(jax.tree.leaves(o)[0].reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / iters
        if r > 0:  # round 0 is the post-compile settle round
            best = min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.data.pipeline import device_augment
    from detjax.modeling import _detect_fn, _detect_u8_fn, build_model

    np.asarray(jnp.zeros(1))  # pre-warm the first device->host readback

    rng = np.random.default_rng(0)
    for preset, bs in (("retinanet_r50_640", 8), ("retinanet_r50_640", 1)):
        cfg = get_config(preset)
        h, w = cfg.model.image_size
        canvases = jax.device_put(
            rng.integers(0, 256, (bs, h, w, 3)).astype(np.uint8))
        _, variables = build_model(cfg, jax.random.PRNGKey(0))
        dfn = _detect_fn(cfg)
        ufn = _detect_u8_fn(cfg)
        key = jax.random.PRNGKey(0)
        zeros = jnp.zeros((bs, 1, 4), jnp.float32)

        def split():
            x, _ = device_augment(canvases, zeros, key, hflip_prob=0.0,
                                  mean=cfg.data.mean, std=cfg.data.std,
                                  out_dtype=cfg.model.dtype)
            return dfn(variables, x).scores

        def fused():
            return ufn(variables, canvases).scores

        t_split = bench(split)
        t_fused = bench(fused)
        print(json.dumps({
            "preset": preset, "bs": bs,
            "split_ms": round(t_split * 1e3, 2),
            "fused_ms": round(t_fused * 1e3, 2),
            "fused_img_s": round(bs / t_fused, 1),
            "speedup": round(t_split / t_fused, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
