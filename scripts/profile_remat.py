#!/usr/bin/env python
"""Traffic-reduction A/B on the stem/layer1 backward overhang (VERDICT r3
#3): rematerialize the early backbone region in the backward
(``model.remat_early``) instead of round-tripping its saved activations
through HBM. Roofline context: the stem runs ~2× off roofline with a
−8.5 ms overhang attributed to the bandwidth-bound backward reads
(docs/ROOFLINE.md gap region 2); the XLA-floor scenario with the stem at
2× roofline is ~180 img/s.

Run on the real chip:

    python scripts/profile_remat.py [--variants 0 1 2 3]

Acceptance (VERDICT): >= 178 img/s on any variant closes train perf;
otherwise the measured rows go into ROOFLINE.md as rejections.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", nargs="+",
                    default=("0", "1", "2", "3", "f8:1", "f8:2"),
                    help="N = remat_early=N (bit-identical); f8:N = "
                         "f8_remat_stages=N (f8-stored block inputs)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.train.step import make_train_state, make_train_step

    def force(x):
        return float(np.asarray(x).reshape(-1)[0])

    base = get_config("retinanet_r50_640")
    bs = base.train.batch_size
    h, w = base.model.image_size
    rng = np.random.default_rng(0)
    g = base.train.max_gt
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(np.concatenate([
            np.tile(np.array([[[50, 50, 300, 300], [200, 200, 500, 500]]],
                             np.float32), (bs, 1, 1)),
            np.zeros((bs, g - 2, 4), np.float32)], axis=1)),
        "gt_labels": jnp.asarray(np.concatenate([
            np.tile(np.array([[3, 7]], np.int32), (bs, 1)),
            -np.ones((bs, g - 2), np.int32)], axis=1)),
    }

    results = {}
    loss0 = {}
    for v in args.variants:
        if str(v).startswith("f8:"):
            ovr = {"model.f8_remat_stages": int(str(v)[3:])}
        else:
            ovr = {"model.remat_early": int(v)}
        cfg = get_config("retinanet_r50_640", **ovr)
        state = make_train_state(cfg, jax.random.PRNGKey(0))
        step = make_train_step(cfg)
        s, m = step(state, batch)
        loss0[v] = force(m["loss"])
        for _ in range(9):  # settle (axon ramps over early dispatches)
            s, m = step(s, batch)
        force(m["loss"])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, m = step(s, batch)
            force(m["loss"])
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[v] = (best * 1e3, bs / best)
        print(f"variant {v}: {best * 1e3:7.2f} ms/step  "
              f"{bs / best:6.1f} img/s   first-step loss {loss0[v]:.6f}",
              flush=True)

    ref = loss0.get("0")
    if ref is not None:
        for v, l in loss0.items():
            if str(v).startswith("f8:"):
                # f8-stored block inputs change numerics by design —
                # report the drift, don't assert bit-equality
                print(f"  f8 variant {v}: loss drift vs baseline "
                      f"{l - ref:+.6f}")
            else:
                # remat recomputes the same ops on the same inputs: bit-
                # identical under XLA:CPU (tests pin this), but on TPU the
                # changed fusion boundaries move bf16 rounding points —
                # measured ~8e-6 relative drift. Assert closeness.
                assert abs(l - ref) <= 1e-4 * abs(ref), (v, l, ref)
        print("numerics: remat variants match baseline (<=1e-4 relative)")
    if results:
        best_v = min(results, key=lambda v: results[v][0])
        print(f"\nbest: remat_early={best_v} at {results[best_v][1]:.1f} "
              f"img/s (acceptance bar: 178)")


if __name__ == "__main__":
    main()
