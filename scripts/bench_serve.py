#!/usr/bin/env python
"""Serving-engine throughput: concurrent HTTP clients against detjax-serve's
micro-batching server (detjax/serve.py) on the real chip.

Measures end-to-end requests/sec (JPEG decode + letterbox + device batch +
JSON), which on this 1-core host is host-bound below the device rate —
the device-side fused-infer ceiling is bench.py's infer number.

    python scripts/bench_serve.py [--engine fp|int8] [--clients 16] [--reqs 8]
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
    ap.add_argument("--engine", default="fp")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--reqs", type=int, default=8, help="requests per client")
    ap.add_argument("--image-size", type=int, default=640)
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the split-phase dispatch/finalize engine "
                         "(A/B the serving-overlap feature)")
    args = ap.parse_args()

    import jax
    from PIL import Image

    from detjax.config import get_config
    from detjax.modeling import build_model
    from detjax.serve import DetectionServer

    s = args.image_size
    cfg = get_config("retinanet_r50_640", **{
        "model.image_size": (s, s), "eval.batch_size": args.batch_size})
    _, variables = build_model(cfg)
    srv = DetectionServer(variables, cfg, engine=args.engine,
                          batch_size=args.batch_size, max_wait_ms=2.0,
                          score_threshold=0.3, overlap=not args.no_overlap)
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=("127.0.0.1", 0, ready),
                         daemon=True)
    t.start()
    # serve() compiles the engine BEFORE binding (cold-start off the
    # request path) — minutes-scale on a cold box; poll so a dead server
    # thread (warmup/compile failure) surfaces immediately, not in 1 h
    while not ready.wait(10):
        assert t.is_alive(), "server thread died during warmup/startup"

    url = f"http://127.0.0.1:{srv.port}/detect"

    rng = np.random.default_rng(0)
    payloads = []
    for i in range(8):
        img = rng.integers(0, 256, (480, 640, 3), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85)
        payloads.append(buf.getvalue())

    def post(i):
        req = urllib.request.Request(url, data=payloads[i % len(payloads)])
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    print("warmup (compiles)...", flush=True)
    post(0)

    n_total = args.clients * args.reqs
    errs = []

    def client(cid):
        for r in range(args.reqs):
            try:
                post(cid * args.reqs + r)
            except Exception as e:  # pragma: no cover
                errs.append(e)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    dt = time.perf_counter() - t0
    assert not errs, errs[:3]
    print(f"engine={args.engine} batch={args.batch_size} "
          f"clients={args.clients}: {n_total} reqs in {dt:.2f}s → "
          f"{n_total / dt:.1f} req/s e2e "
          f"({dt / n_total * 1e3:.1f} ms/req amortized)")
    srv.shutdown()


if __name__ == "__main__":
    main()
