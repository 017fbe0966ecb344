#!/usr/bin/env python
"""Serving-export CLI: checkpoint → self-contained StableHLO detect artifact.

The reference's deployment story is ``torch.save(model, ...)`` + matching
model code on the serving host (SURVEY.md §5.4). This emits the TPU-native
equivalent: one file containing the compiled fused detect graph with the
trained weights baked in (see detjax/export.py). Verify with --selftest,
which reloads the artifact and diffs it against the live detect path.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output artifact path (e.g. detect.stablehlo)")
    ap.add_argument("--preset", default="retinanet_r50_640")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering platforms (default: "
                         "current backend), e.g. 'tpu,cpu'")
    ap.add_argument("--selftest", action="store_true",
                    help="reload the artifact and diff vs live detect()")
    ap.add_argument("--int8-calibrate", nargs="+", metavar="IMAGE",
                    help="PTQ-quantize on these image files and export the "
                         "INT8 engine's graph instead of the fp one")
    ap.add_argument("--int8-calib-mode", default="absmax",
                    choices=("absmax", "p999"),
                    help="PTQ activation-range estimator: full abs-max or "
                         "99.9th-percentile clip (robust to activation "
                         "outliers; see BASELINE.md calibration study)")
    ap.add_argument("--input", default="fp32", choices=("fp32", "u8"),
                    help="artifact input signature: normalized fp32 images "
                         "(legacy) or raw uint8 canvases with mean/std "
                         "normalization baked into the graph (serving fast "
                         "path: one dispatch, 4x fewer H2D bytes)")
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="group.field=value")
    from detjax.utils.cache import (add_compile_cache_flag,
                                    apply_compile_cache_flag)

    add_compile_cache_flag(ap)
    args = ap.parse_args()
    apply_compile_cache_flag(args)

    import os

    import jax
    import numpy as np

    from detjax.cli.common import load_variables, parse_overrides
    from detjax.export import load_detect, save_detect

    cfg, variables = load_variables(args.preset, args.ckpt_dir,
                                    parse_overrides(args.overrides))

    calibration = None
    if args.int8_calibrate:
        from detjax.cli.common import load_calibration_batch

        calibration = load_calibration_batch(args.int8_calibrate, cfg)
        print(f"int8 PTQ calibrated on {len(args.int8_calibrate)} image(s)")

    platforms = tuple(p for p in args.platforms.split(",") if p) or None
    save_detect(args.out, variables, cfg, batch_size=args.batch_size,
                platforms=platforms, calibration=calibration,
                input_format=args.input, calib_mode=args.int8_calib_mode)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"batch={args.batch_size}, image={cfg.model.image_size}, "
          f"input={args.input})")

    if args.selftest:
        from detjax.modeling import detect

        h, w = cfg.model.image_size
        if args.input == "u8":
            images = jax.random.randint(
                jax.random.PRNGKey(1), (args.batch_size, h, w, 3), 0, 256,
                dtype="uint8")
        else:
            images = jax.random.uniform(
                jax.random.PRNGKey(1), (args.batch_size, h, w, 3))
        served = load_detect(args.out)(images)
        if calibration is not None:
            # compare against the live int8 engine (quantization is
            # deterministic given the same calibration batch)
            from detjax import quant

            qtree = quant.quantize_model(variables, cfg, calibration,
                                         calib_mode=args.int8_calib_mode)
            live = (quant.detect_int8_u8(qtree, images, cfg)
                    if args.input == "u8"
                    else quant.detect_int8(qtree, images, cfg))
        elif args.input == "u8":
            from detjax.modeling import detect_u8

            live = detect_u8(variables, images, cfg)
        else:
            live = detect(variables, images, cfg)
        # The artifact is lowered separately from the live jit, so bf16
        # conv drift (~1e-2 in scores) can swap the RANK of near-tied
        # detections and push a score across the eval threshold — compare
        # the shared top of the score distribution, tolerate ±1 count.
        nv_s = np.asarray(served.num_valid).reshape(-1)
        nv_l = np.asarray(live.num_valid).reshape(-1)
        sc_s = np.sort(np.asarray(served.scores).reshape(len(nv_s), -1))
        sc_l = np.sort(np.asarray(live.scores).reshape(len(nv_l), -1))
        max_delta, ok = 0.0, True
        for i in range(len(nv_s)):
            k = int(min(nv_s[i], nv_l[i]))
            d = 0.0 if k == 0 else float(
                np.abs(sc_s[i, -k:] - sc_l[i, -k:]).max())
            max_delta = max(max_delta, d)
            ok = ok and abs(int(nv_s[i]) - int(nv_l[i])) <= 1 and d < 2e-2
        print(f"selftest: counts within ±1 + shared score distribution "
              f"within bf16 drift → {'OK' if ok else 'MISMATCH'} "
              f"(max score delta {max_delta:.2e})")
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
