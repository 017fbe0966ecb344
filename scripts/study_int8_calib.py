#!/usr/bin/env python
"""Int8 PTQ calibration robustness study (VERDICT r3 #7).

Sweeps the PTQ accuracy of the flagship-scale hard-gate model (80 classes
@640, crowds, small objects — scripts/e2e_gate._hard_setup) along the
axes a serving customer actually controls:

  * calibration-set SIZE: 1 / 4 / 8 / 16 images from the eval stream;
  * calibration DISTRIBUTION: in-distribution eval canvases vs
    uniform-noise canvases (worst-case shift — ranges estimated on data
    the model never sees in production);
  * range ESTIMATOR: abs-max vs 99.9th-percentile clip
    (``--int8-calib-mode``, detjax/quant.py CALIB_MODES).

Output: one AP/AP50/AP75 row per (mode, calibration) cell, markdown-ready
for BASELINE.md. Run on the real chip:

    python scripts/study_int8_calib.py [--sizes 1 4 8 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="+", default=(1, 4, 8, 16))
    ap.add_argument("--steps", type=int, default=2500,
                    help="hard-gate training steps (e2e_gate default)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from detjax import quant
    from detjax.data.pipeline import device_augment, make_eval_iterator
    from detjax.evaluation.evaluator import run_coco_eval
    from e2e_gate import _hard_trained

    cfg, ds, variables = _hard_trained("calib-study")

    fp = run_coco_eval(variables, ds, cfg)
    print(f"\nfp baseline: AP {fp.stats['AP']:.4f} AP50 "
          f"{fp.stats['AP50']:.4f} AP75 {fp.stats['AP75']:.4f}")

    # in-distribution calibration pool: the eval stream's canvases,
    # normalized exactly as the engine will see them
    pool = []
    for batch in make_eval_iterator(ds, cfg):
        imgs = jnp.asarray(batch["images"])
        x, _ = device_augment(
            imgs, jnp.zeros((imgs.shape[0], 1, 4), jnp.float32),
            jax.random.PRNGKey(0), hflip_prob=0.0,
            mean=cfg.data.mean, std=cfg.data.std)
        pool.append(np.asarray(x))
    pool = np.concatenate(pool)[:max(args.sizes)]

    h, w = cfg.model.image_size
    rng = np.random.default_rng(0)
    noise_u8 = rng.integers(0, 256, (8, h, w, 3)).astype(np.uint8)
    noise, _ = device_augment(
        jnp.asarray(noise_u8), jnp.zeros((8, 1, 4), jnp.float32),
        jax.random.PRNGKey(0), hflip_prob=0.0,
        mean=cfg.data.mean, std=cfg.data.std)

    rows = []

    def run_cell(mode: str, calib: np.ndarray, label: str):
        t0 = time.time()
        qtree = quant.quantize_model(variables, cfg, jnp.asarray(calib),
                                     calib_mode=mode)
        ev = run_coco_eval(
            variables, ds, cfg,
            detect_fn=lambda _, x: quant.detect_int8(qtree, x, cfg))
        d = ev.stats["AP"] - fp.stats["AP"]
        rows.append((mode, label, ev.stats["AP"], ev.stats["AP50"],
                     ev.stats["AP75"], d))
        print(f"  {mode:>6} {label:>14}: AP {ev.stats['AP']:.4f} "
              f"(Δfp {d:+.4f}) AP50 {ev.stats['AP50']:.4f} "
              f"[{time.time() - t0:.0f}s]", flush=True)

    for mode in quant.CALIB_MODES:
        print(f"\nmode={mode}")
        for n in args.sizes:
            run_cell(mode, pool[:n], f"{n} eval img")
        run_cell(mode, np.asarray(noise), "8 noise img")

    print("\n| mode | calibration | AP | AP50 | AP75 | ΔAP vs fp |")
    print("|---|---|---|---|---|---|")
    print(f"| fp | — | {fp.stats['AP']:.4f} | {fp.stats['AP50']:.4f} | "
          f"{fp.stats['AP75']:.4f} | — |")
    for mode, label, a, a50, a75, d in rows:
        print(f"| int8/{mode} | {label} | {a:.4f} | {a50:.4f} | {a75:.4f} "
              f"| {d:+.4f} |")


if __name__ == "__main__":
    main()
