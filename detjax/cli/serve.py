#!/usr/bin/env python
"""Detection serving CLI: checkpoint → micro-batching HTTP service.

    detjax-serve --ckpt-dir /run/ckpt --port 8000 --engine fp
    curl -s -X POST --data-binary @photo.jpg localhost:8000/detect | jq

See detjax/serve.py for the serving design (static padded batches, one
compiled graph, fp / int8 / StableHLO-artifact engines).
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="retinanet_r50_640_latency")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--engine", default="fp",
                    help="'fp', 'int8', or a path to a StableHLO artifact "
                         "from detjax-export (exported at --batch-size)")
    ap.add_argument("--int8-calibrate", nargs="+", metavar="IMAGE",
                    help="with --engine int8: image files to calibrate PTQ "
                         "activation ranges on (REQUIRED for int8)")
    ap.add_argument("--int8-calib-mode", default="absmax",
                    choices=("absmax", "p999"),
                    help="PTQ activation-range estimator: full abs-max or "
                         "99.9th-percentile clip (robust to activation "
                         "outliers; see BASELINE.md calibration study)")
    ap.add_argument("--batch-size", type=int, default=8,
                    help="compiled micro-batch size")
    ap.add_argument("--buckets", type=int, nargs="+", metavar="SIZE",
                    help="canvas bucketing: compile one engine per square "
                         "canvas size (e.g. --buckets 320 640) and route "
                         "each image to the smallest canvas that holds it "
                         "unscaled (fp/int8 engines)")
    ap.add_argument("--mesh", type=int, nargs="?", const=0, default=None,
                    metavar="N",
                    help="SPMD serving: shard each batch over a "
                         "data-parallel mesh of N local devices (bare "
                         "flag: all devices); --batch-size must be "
                         "divisible by N (fp/int8 engines)")
    ap.add_argument("--max-wait-ms", type=float, default=2.0,
                    help="request-coalescing window")
    ap.add_argument("--score-threshold", type=float, default=0.3)
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="group.field=value")
    from detjax.utils.cache import (add_compile_cache_flag,
                                    apply_compile_cache_flag)

    add_compile_cache_flag(ap, default_on=True)
    args = ap.parse_args()
    cache_dir = apply_compile_cache_flag(args, default_on=True)
    if cache_dir:
        print(f"persistent compile cache: {cache_dir}")

    from detjax.cli.common import load_variables, parse_overrides
    from detjax.data.coco import COCO_CLASSES
    from detjax.serve import DetectionServer

    cfg, variables = load_variables(args.preset, args.ckpt_dir,
                                    parse_overrides(args.overrides))
    names = (COCO_CLASSES if cfg.model.num_classes == len(COCO_CLASSES)
             else None)

    calibration = None
    if args.engine == "int8" and not args.int8_calibrate:
        ap.error("--engine int8 requires --int8-calibrate IMAGE... "
                 "(PTQ ranges frozen from an arbitrary first request are "
                 "unrepresentative and non-reproducible)")
    if args.int8_calibrate:
        from detjax.cli.common import load_calibration_batch

        calibration = load_calibration_batch(args.int8_calibrate, cfg,
                                             normalize=False)
        print(f"int8 PTQ calibration: {len(args.int8_calibrate)} image(s)")

    mesh = None
    if args.mesh is not None:
        import jax

        from detjax.parallel.mesh import make_mesh

        avail = jax.devices()
        if args.mesh == 0:
            devices = avail
        else:
            # a silent slice would start the server on fewer devices than
            # requested (or a nonsense slice for negative N) — refuse up
            # front instead (ADVICE r3)
            if not 0 < args.mesh <= len(avail):
                ap.error(f"--mesh {args.mesh}: need 1..{len(avail)} "
                         f"(available devices: {len(avail)})")
            devices = avail[:args.mesh]
        mesh = make_mesh(devices)
        print(f"SPMD serving mesh: {len(devices)} device(s)")

    server = DetectionServer(
        variables, cfg, engine=args.engine, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms, score_threshold=args.score_threshold,
        class_names=names, calibration=calibration, buckets=args.buckets,
        mesh=mesh, int8_calib_mode=args.int8_calib_mode)

    import signal
    import threading

    def _terminate(signum, frame):
        # SIGTERM (orchestrator stop): finish in-flight batches, then exit.
        # shutdown() must not run on this (signal) frame — serve_forever's
        # shutdown handshake deadlocks if called from the serving thread.
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _terminate)

    print(f"serving {cfg.model.name} ({args.engine}) on "
          f"http://{args.host}:{args.port}  "
          f"[batch={args.batch_size}, window={args.max_wait_ms}ms]")
    try:
        server.serve(args.host, args.port)
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()


if __name__ == "__main__":
    main()
