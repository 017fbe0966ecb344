"""One-off experiment: detjax eval leg of the torchref two-stack mAP
comparison, with the canvas geometry matched to the torch replica.

The failed gate run (gate_torchref log, 2026-08-19) compared:
  - torch replica: protocol resize of each 640x640 source -> EXACT 608x608
    canvas (content fills it; conv edges see implicit zero padding)
  - detjax: the same 608-scaled content letterboxed onto the STATIC
    640x640 model canvas (32-px ring of normalized-black ~ -2.1), at
    production bf16
Worst delta -0.016 (ARm), concentrated at high-IoU / AR stats = border
environment + precision, not protocol logic.

This experiment runs the detjax leg with model.image_size=(608,608) so
both stacks see identical pixels, at (a) true-fp32 matmuls, (b)
production bf16; prints both 12-stat tables vs the recorded torch stats.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DETJAX_GATE_CACHE", "/tmp/gate_cache")

import jax
import numpy as np

from e2e_gate import _hard_trained, run_coco_eval

TORCH_STATS = {  # recorded from /tmp/gate_torchref2.log (same seed/workload)
    "AP": 0.8112, "AP50": 0.9140, "AP75": 0.9016,
    "APs": 0.7000, "APm": 0.7302, "APl": 0.8734,
    "AR1": 0.8213, "AR10": 0.8362, "AR100": 0.8362,
    "ARs": 0.7000, "ARm": 0.7460, "ARl": 0.9156,
}


def leg(cfg, ds, variables, image_size, dtype, highest):
    c = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=image_size,
                                  dtype=dtype),
        data=dataclasses.replace(cfg.data, eval_scale_minmax=(608, 1024)))
    t0 = time.time()
    if highest:
        with jax.default_matmul_precision("highest"):
            ev = run_coco_eval(variables, ds, c)
    else:
        ev = run_coco_eval(variables, ds, c)
    worst = 0.0
    print(f"--- image_size={image_size} dtype={dtype} "
          f"highest={highest} ({time.time()-t0:.0f}s)")
    for k, v in ev.stats.items():
        d = v - TORCH_STATS[k]
        worst = max(worst, abs(d))
        print(f"{k:>6} {v:8.4f} {TORCH_STATS[k]:9.4f} {d:+8.4f}")
    print(f"worst |delta| = {worst:.4f}  ({'PASS' if worst <= 0.002 else 'FAIL'} at 0.002)")
    return worst


def main():
    cfg, ds, variables = _hard_trained("exp")
    leg(cfg, ds, variables, (608, 608), "float32", True)
    leg(cfg, ds, variables, (608, 608), cfg.model.dtype, False)


if __name__ == "__main__":
    main()
