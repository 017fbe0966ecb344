#!/usr/bin/env python
"""BASELINE config 1, literal reading: "single 640×640 COCO image
inference on CPU (boxes+NMS end-to-end)" (VERDICT r2 #7).

Exports the fused detect artifact ON the CPU backend (trace-time backend
selects the lax NMS path — the exact semantics the TPU Pallas kernel is
diffed against) and measures bs=1 end-to-end latency through the
deserialized StableHLO artifact, fp32 (the CPU deployment dtype; bf16 has
no fast CPU path).

Run: python scripts/bench_cpu_infer.py   (any box; forces JAX_PLATFORMS=cpu)
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.export import load_detect, save_detect
    from detjax.modeling import build_model

    cfg = get_config("retinanet_r50_640", **{"model.dtype": "float32"})
    _, variables = build_model(cfg)
    path = os.path.join(tempfile.mkdtemp(), "detect_cpu.stablehlo")
    save_detect(path, variables, cfg, batch_size=args.batch)
    print(f"artifact: {os.path.getsize(path) / 1e6:.1f} MB "
          f"(cpu, fp32, lax-NMS, bs={args.batch})")

    fn = load_detect(path)
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (args.batch, 640, 640, 3)),
        jnp.float32)
    det = fn(x)
    int(np.asarray(det.num_valid[0]))  # compile + run
    t0 = time.perf_counter()
    for _ in range(args.iters):
        det = fn(x)
        int(np.asarray(det.num_valid[0]))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"cpu bs={args.batch} 640px end-to-end: {dt * 1e3:.1f} ms/batch "
          f"({args.batch / dt:.2f} img/s) on {os.cpu_count()} core(s)")


if __name__ == "__main__":
    main()
