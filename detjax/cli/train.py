#!/usr/bin/env python
"""Training CLI — the detjax mirror of the reference's ``train.py``
(SURVEY.md §3.1: ``python train.py --dataset coco --depth 50 ...``).

Examples:
  # COCO (needs instances_train2017.json + images)
  python scripts/train.py --preset retinanet_r50_640 \
      --coco-path /data/coco --steps 90000 --ckpt-dir /tmp/run1

  # self-contained synthetic smoke run (no data needed)
  python scripts/train.py --synthetic --steps 200

  # data-parallel over every visible chip (benchmark config 5)
  python scripts/train.py --preset coco_v5e8 --coco-path /data/coco --dp
Any config field is overridable: --set train.learning_rate=1e-4
"""

from __future__ import annotations

import argparse
import os

from detjax.cli.common import parse_overrides


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--preset", default="retinanet_r50_640")
    ap.add_argument("--depth", type=int, choices=(18, 34, 50, 101, 152),
                    help="backbone depth (mirrors the reference's --depth; "
                         "shorthand for --set model.backbone_depth=N)")
    ap.add_argument("--coco-path", help="dir with annotations/ and images/")
    ap.add_argument("--train-ann", help="explicit annotation JSON path")
    ap.add_argument("--train-images", help="explicit image dir")
    ap.add_argument("--val-ann")
    ap.add_argument("--val-images")
    ap.add_argument("--csv-train",
                    help="CSV annotation file (the lineage's --csv_train "
                         "alternate dataset, SURVEY.md §2 #18)")
    ap.add_argument("--csv-classes",
                    help="class_name,id CSV (with --csv-train)")
    ap.add_argument("--csv-val", help="CSV annotations for periodic eval")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on the synthetic dataset (smoke/demo)")
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--log-dir", default="")
    ap.add_argument("--tensorboard", action="store_true",
                    help="also write tf.summary scalars under <log-dir>/tb")
    ap.add_argument("--dp", action="store_true",
                    help="pjit data-parallel over all visible devices")
    ap.add_argument("--spatial", type=int, default=1, metavar="K",
                    help="spatial partitioning: 2-D (data, space=K) mesh, "
                         "image rows sharded over K chips per image group "
                         "(large-canvas scale-out; implies --dp)")
    ap.add_argument("--import-backbone",
                    help="torch state_dict .pt with pretrained ResNet")
    ap.add_argument("--import-detector",
                    help="torch state_dict .pt with a full lineage detector "
                         "(backbone+FPN+heads)")
    ap.add_argument("--eval-images", type=int, default=None,
                    help="cap on periodic-eval images")
    ap.add_argument("--debug", action="store_true",
                    help="enable jax_debug_nans NaN hunting (SURVEY.md §5.2)")
    ap.add_argument("--trace-dir", default="",
                    help="capture a jax.profiler device trace of the first "
                         "logged window into this dir (Perfetto/TensorBoard)")
    ap.add_argument("--unsafe-pickle", action="store_true",
                    help="allow --import-backbone to unpickle whole-module "
                         "checkpoints (executes code from the file)")
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="group.field=value")
    from detjax.utils.cache import (add_compile_cache_flag,
                                    apply_compile_cache_flag)

    add_compile_cache_flag(ap)
    args = ap.parse_args()
    apply_compile_cache_flag(args)
    if not args.synthetic and not (args.coco_path or args.train_ann
                                   or args.csv_train):
        ap.error("one of --coco-path, --train-ann, --csv-train or "
                 "--synthetic is required")
    if args.train_ann and not (args.train_images or args.coco_path):
        ap.error("--train-ann needs --train-images (or --coco-path)")
    if args.csv_train and not args.csv_classes:
        ap.error("--csv-train needs --csv-classes")

    import jax

    # honor JAX_PLATFORMS even where a sitecustomize force-prefers a
    # backend (e.g. JAX_PLATFORMS=cpu + xla_force_host_platform_device_count
    # to exercise --dp on a virtual mesh)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if args.debug:
        jax.config.update("jax_debug_nans", True)

    from detjax.config import get_config
    from detjax.data import (CocoDataset, CSVDataset,
                             SyntheticDetectionDataset, make_train_iterator)
    from detjax.train import fit, make_train_state
    from detjax.train.loop import FitResult

    overrides = parse_overrides(args.overrides)
    if args.depth is not None:
        overrides["model.backbone_depth"] = args.depth
    cfg = get_config(args.preset, **overrides)

    if args.synthetic:
        train_ds = SyntheticDetectionDataset(
            num_images=64, image_size=cfg.model.image_size,
            num_classes=cfg.model.num_classes)
        eval_ds = SyntheticDetectionDataset(
            num_images=16, image_size=cfg.model.image_size,
            num_classes=cfg.model.num_classes, seed=1)
    elif args.csv_train:
        train_ds = CSVDataset(args.csv_train, args.csv_classes,
                              image_dir=args.train_images)
        eval_ds = (CSVDataset(args.csv_val, args.csv_classes,
                              image_dir=args.val_images or args.train_images)
                   if args.csv_val else None)
        if cfg.model.num_classes != train_ds.num_classes:
            overrides["model.num_classes"] = train_ds.num_classes
            cfg = get_config(args.preset, **overrides)
            print(f"num_classes={train_ds.num_classes} (from --csv-classes)")
    else:
        ann = args.train_ann or os.path.join(
            args.coco_path, "annotations",
            f"instances_{cfg.data.train_split}.json")
        imgs = args.train_images or os.path.join(
            args.coco_path, cfg.data.train_split)
        train_ds = CocoDataset(ann, imgs)
        eval_ds = None
        val_ann = args.val_ann or (args.coco_path and os.path.join(
            args.coco_path, "annotations",
            f"instances_{cfg.data.eval_split}.json"))
        if val_ann and os.path.exists(val_ann):
            eval_ds = CocoDataset(
                val_ann, args.val_images or os.path.join(
                    args.coco_path, cfg.data.eval_split))

    state = make_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    if args.import_backbone or args.import_detector:
        from detjax.utils.torch_import import (
            import_detector_into_variables, import_into_variables,
            load_state_dict_file)

        path = args.import_detector or args.import_backbone
        sd = load_state_dict_file(path, allow_pickle=args.unsafe_pickle)
        importer = (import_detector_into_variables if args.import_detector
                    else import_into_variables)
        variables = importer(
            {"params": state.params, "batch_stats": state.batch_stats},
            sd, depth=cfg.model.backbone_depth)
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        what = "detector" if args.import_detector else "backbone"
        print(f"imported pretrained {what} from {path}")

    mesh = None
    if args.dp or args.spatial > 1:
        from detjax.parallel import make_mesh

        mesh = make_mesh(spatial=args.spatial)
        print(f"{'DP×SP' if args.spatial > 1 else 'data-parallel'} "
              f"mesh: {mesh}")

    import contextlib

    from detjax.utils.profiling import trace_context

    tracing = (trace_context("detjax-train", args.trace_dir)
               if args.trace_dir else contextlib.nullcontext())
    with tracing:
        result: FitResult = fit(
            cfg, make_train_iterator(train_ds, cfg), num_steps=args.steps,
            state=state, eval_dataset=eval_ds,
            eval_max_images=args.eval_images,
            checkpoint_dir=args.ckpt_dir or None,
            log_dir=args.log_dir or None, mesh=mesh,
            tensorboard=args.tensorboard)
    print(f"done: step={int(result.state.step)} "
          f"throughput={result.images_per_sec:.1f} img/s")


if __name__ == "__main__":
    main()
