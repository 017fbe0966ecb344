#!/usr/bin/env python
"""Detection demo CLI — mirror of the reference's ``visualize.py`` demo
(SURVEY.md §2 #19): run the fused detect path on image files and save
box-annotated copies."""

from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("images", nargs="+", help="input image file(s)")
    ap.add_argument("--preset", default="retinanet_r50_640")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out-dir", default="detections")
    ap.add_argument("--score-threshold", type=float, default=0.3)
    ap.add_argument("--int8", action="store_true",
                    help="serve through the int8 PTQ engine (detjax/quant.py;"
                         " calibrates on the first input image)")
    ap.add_argument("--int8-calib-mode", default="absmax",
                    choices=("absmax", "p999"),
                    help="PTQ activation-range estimator: full abs-max or "
                         "99.9th-percentile clip (robust to activation "
                         "outliers; see BASELINE.md calibration study)")
    ap.add_argument("--ema", action="store_true",
                    help="use the EMA shadow params (train.ema_decay>0 "
                         "checkpoint; pass the same --set here)")
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="group.field=value")
    from detjax.utils.cache import (add_compile_cache_flag,
                                    apply_compile_cache_flag)

    add_compile_cache_flag(ap)
    args = ap.parse_args()
    apply_compile_cache_flag(args)

    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from detjax.cli.common import load_variables, parse_overrides
    from detjax.data.coco import COCO_CLASSES
    from detjax.data.pipeline import device_augment
    from detjax.data.transforms import letterbox
    from detjax.modeling import detect
    from detjax.utils.visualize import draw_detections

    cfg, variables = load_variables(args.preset, args.ckpt_dir,
                                    parse_overrides(args.overrides),
                                    use_ema=args.ema)
    names = (COCO_CLASSES if cfg.model.num_classes == len(COCO_CLASSES)
             else None)

    os.makedirs(args.out_dir, exist_ok=True)
    qtree = None
    for path in args.images:
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        canvas, _, scale = letterbox(img, np.zeros((0, 4), np.float32),
                                     cfg.model.image_size)
        x, _ = device_augment(jnp.asarray(canvas)[None],
                              jnp.zeros((1, 1, 4), jnp.float32),
                              jax.random.PRNGKey(0), hflip_prob=0.0,
                              mean=cfg.data.mean, std=cfg.data.std,
                              out_dtype=cfg.model.dtype)
        if args.int8:
            from detjax import quant

            if qtree is None:
                print("int8: calibrating PTQ activation ranges on "
                      f"{path} (first input image); detections for other "
                      "images depend on this image's activation ranges",
                      file=sys.stderr)
                qtree = quant.quantize_model(
                    variables, cfg, x, calib_mode=args.int8_calib_mode)
            det = quant.detect_int8(qtree, x, cfg)
        else:
            det = detect(variables, x, cfg)
        nv = int(det.num_valid[0])
        boxes = np.asarray(det.boxes[0, :nv]) / scale
        out = draw_detections(img, boxes, np.asarray(det.scores[0, :nv]),
                              np.asarray(det.labels[0, :nv]), names,
                              args.score_threshold)
        dst = os.path.join(args.out_dir, os.path.basename(path))
        Image.fromarray(out).save(dst)
        print(f"{path}: {nv} detections → {dst}")


if __name__ == "__main__":
    main()
