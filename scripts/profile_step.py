#!/usr/bin/env python
"""Time the production flagship train step (R50-640 bs16) — the bare
step-timer used for before/after A/Bs of in-tree changes (same protocol
as scripts/profile_dot1x1.py: donation-safe state chaining, throwaway
round, min over rounds, one forced host fetch per round).

Run on the real chip: python scripts/profile_step.py [--preset NAME]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="retinanet_r50_640")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.train.step import make_train_state, make_train_step

    np.asarray(jnp.zeros(8))  # absorb cold-tunnel D2H stall

    cfg = get_config(args.preset)
    bs, (h, w) = cfg.train.batch_size, cfg.model.image_size
    g = cfg.train.max_gt
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32),
        "gt_boxes": jnp.tile(
            jnp.asarray([[[50.0, 50, 300, 300]]], jnp.float32), (bs, g, 1)),
        "gt_labels": jnp.concatenate(
            [jnp.full((bs, 2), 3, jnp.int32),
             -jnp.ones((bs, g - 2), jnp.int32)], axis=1),
    }
    state = make_train_state(cfg)
    step = make_train_step(cfg)
    s, m = step(state, batch)
    np.asarray(m["loss"])
    best = float("inf")
    for r in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = step(s, batch)
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"round {r}: {dt * 1e3:7.2f} ms "
              f"({bs / dt:6.1f} img/s){' (throwaway)' if r == 0 else ''}",
              flush=True)
        if r > 0:
            best = min(best, dt)
    print(f"best: {best * 1e3:.2f} ms ({bs / best:.1f} img/s)")


if __name__ == "__main__":
    main()
