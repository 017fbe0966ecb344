#!/usr/bin/env python
"""COCO evaluation CLI — mirror of the reference's ``coco_eval.py``
(SURVEY.md §3.3): restore a checkpoint, run batched fused inference over the
val set, print the 12 standard COCO bbox stats."""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="retinanet_r50_640")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--ann", help="instances_val2017.json path")
    ap.add_argument("--images", help="val image dir")
    ap.add_argument("--csv", help="CSV annotation file (lineage csv_eval path)")
    ap.add_argument("--class-map", help="class_name,id CSV (with --csv)")
    ap.add_argument("--voc", action="store_true",
                    help="VOC-style per-class AP@0.5 instead of COCO stats")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--set", action="append", dest="overrides")
    args = ap.parse_args()

    import jax

    from detjax.config import get_config
    from detjax.data import CocoDataset, CSVDataset, SyntheticDetectionDataset
    from detjax.evaluation import run_coco_eval
    from detjax.evaluation.evaluator import run_voc_eval
    from detjax.train import make_train_state
    from detjax.train.checkpoint import Checkpointer

    import ast

    def parse_overrides(pairs):
        out = {}
        for p in pairs or []:
            key, _, val = p.partition("=")
            try:
                out[key] = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                out[key] = val
        return out

    cfg = get_config(args.preset, **parse_overrides(args.overrides))
    if args.synthetic:
        ds = SyntheticDetectionDataset(
            num_images=32, image_size=cfg.model.image_size,
            num_classes=cfg.model.num_classes, seed=1)
    elif args.csv:
        ds = CSVDataset(args.csv, args.class_map, image_dir=args.images)
    else:
        ds = CocoDataset(args.ann, args.images)

    state = make_train_state(cfg, jax.random.PRNGKey(0))
    state = Checkpointer(args.ckpt_dir).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.voc:
        res = run_voc_eval(variables, ds, cfg, max_images=args.max_images)
        for k, v in res.items():
            print(f"{k}: {v:.4f}")
    else:
        res = run_coco_eval(variables, ds, cfg, max_images=args.max_images)
        for k, v in res.stats.items():
            print(f"{k:>6}: {v:.4f}")


if __name__ == "__main__":
    main()
