#!/usr/bin/env python
"""Serving cold-start: warmup seconds with the persistent compile cache.

Run TWICE with the same --cache dir (fresh process each time): the first
run pays the full XLA compile, the second — "the redeployed server" —
deserializes the compiled engines (detjax/utils/cache.py). Also drives one
real HTTP /detect round-trip so the whole serve surface is exercised.

    python scripts/bench_coldstart.py --cache /tmp/detjax_cache [--mesh]

--mesh runs the tiny-model SPMD variant on a data-parallel mesh over all
visible devices (use JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_
device_count=8 for the virtual 8-device mesh).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    t_start = time.time()
    from detjax.utils.cache import enable_compile_cache

    print("cache:", enable_compile_cache(args.cache))

    from detjax.config import get_config
    from detjax.modeling import build_model
    from detjax.serve import DetectionServer

    if args.mesh:
        cfg = get_config(
            "retinanet_r50_640",
            **{"model.image_size": (64, 64), "model.num_classes": 4,
               "model.dtype": "float32", "model.backbone_depth": 18,
               "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    else:
        cfg = get_config("retinanet_r50_640")
    _, variables = build_model(cfg)

    mesh = None
    if args.mesh:
        from detjax.parallel.mesh import make_mesh

        mesh = make_mesh()
        print("mesh devices:", mesh.devices.size)

    srv = DetectionServer(variables, cfg, engine="fp",
                          batch_size=args.batch_size,
                          score_threshold=0.0, mesh=mesh)
    t0 = time.time()
    srv.warmup()
    print(f"warmup_s {time.time() - t0:.2f}")

    ready = threading.Event()
    t = threading.Thread(target=srv.serve,
                         args=("127.0.0.1", 0, ready, False), daemon=True)
    t.start()
    assert ready.wait(120)

    from PIL import Image

    img = np.random.default_rng(0).integers(0, 256, (90, 120, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/detect", data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=120) as r:
        dets = json.loads(r.read())["detections"]
    print(f"detections: {len(dets)}")
    for d in dets:  # original-coordinate contract
        x0, y0, x1, y1 = d["box"]
        assert 0 <= x0 <= x1 <= 120 and 0 <= y0 <= y1 <= 90, d
    srv.shutdown()
    print(f"total_s {time.time() - t_start:.2f}")
    print("COLDSTART OK")


if __name__ == "__main__":
    main()
