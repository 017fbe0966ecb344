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


def attribute(args):
    """Phase-attributed cold start (VERDICT r3 #5): where do the seconds
    of a serving restart actually go, and does a populated compile cache
    remove the backend-compile phase?

    Phases: python imports → backend init → jit trace/lowering → backend
    compile (the ONLY phase the persistent cache can remove — on a hit it
    becomes executable deserialization) → first dispatch+execute. Run
    twice with the same --cache dir; compare the `compile_s` rows. Cache
    hit/miss is read from the cache dir's file set (a hit writes
    nothing)."""
    import pathlib

    t0 = time.time()
    from detjax.utils.cache import enable_compile_cache

    cache_dir = enable_compile_cache(args.cache)
    pre = {p for p in pathlib.Path(cache_dir).rglob("*") if p.is_file()}

    import jax  # noqa: F811

    from detjax.config import get_config
    from detjax.modeling import _detect_u8_fn, build_model

    t_imports = time.time() - t0
    t0 = time.time()
    dev = jax.devices()[0]
    t_backend = time.time() - t0

    cfg = get_config("retinanet_r50_640")
    _, variables = build_model(cfg)  # includes the init jit (tiny)
    h, w = cfg.model.image_size
    spec = jax.ShapeDtypeStruct((args.batch_size, h, w, 3), "uint8")

    fn = _detect_u8_fn(cfg)
    t0 = time.time()
    lowered = fn.lower(variables, spec)
    t_trace = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    canvases = np.zeros((args.batch_size, h, w, 3), np.uint8)
    t0 = time.time()
    det = compiled(variables, canvases)
    np.asarray(det.num_valid)  # force through the tunnel
    t_first = time.time() - t0

    wrote = [p for p in pathlib.Path(cache_dir).rglob("*")
             if p.is_file() and p not in pre]
    total_bytes = sum(p.stat().st_size for p in wrote)
    print(f"backend           {dev.platform} ({dev.device_kind})")
    print(f"imports_s         {t_imports:8.2f}")
    print(f"backend_init_s    {t_backend:8.2f}")
    print(f"trace_s           {t_trace:8.2f}")
    print(f"compile_s         {t_compile:8.2f}   "
          f"({'MISS: wrote %d entries, %.1f MB' % (len(wrote), total_bytes / 1e6) if wrote else 'cache HIT: nothing written'})")
    print(f"first_dispatch_s  {t_first:8.2f}")
    print("ATTRIBUTION OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--attribute", action="store_true",
                    help="phase-attributed single-engine cold start "
                         "(imports/backend/trace/compile/dispatch) instead "
                         "of the full-server warmup")
    args = ap.parse_args()
    if args.attribute:
        attribute(args)
        return

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
