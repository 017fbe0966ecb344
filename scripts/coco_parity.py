#!/usr/bin/env python
"""One-command COCO mAP parity runbook (SURVEY.md §6 accuracy gate).

The north-star accuracy gate is "COCO mAP parity ±0.2 vs the reference"
(BASELINE.json). This box has neither the COCO dataset nor a reference
checkpoint, so the run cannot happen here — but every piece is built and
tested; this script is the single entrypoint that executes the parity
protocol the moment both artifacts exist:

    python scripts/coco_parity.py \
        --torch-ckpt coco_resnet_50_map_0_335_state_dict.pt \
        --ann  /data/coco/annotations/instances_val2017.json \
        --images /data/coco/val2017 \
        [--depth 50] [--eval-1024] [--max-images N]

Protocol notes:
- Weights: FULL-detector import (backbone + FPN + heads,
  detjax/utils/torch_import.py — padding-exact, torch-differential-tested
  in tests/test_torch_import.py). Lineage whole-module pickles must be
  converted to a state_dict first (torch.save(m.state_dict()) on any
  machine with the reference code; --torch-ckpt accepts state_dict files).
- Resolution (DEFAULT): the reference's exact variable geometry — each
  image at its own min-608/max-1024, pad-to-32 canvas
  (evaluation/protocol.py bucketed engines; SURVEY.md §2 #14). This is
  the geometry the reference's headline 0.335 AP was measured at; the
  fixed-canvas alternatives (--fixed-canvas 640|1024) letterbox onto one
  static shape and were measured to cost up to 0.016 AP from the changed
  border environment alone (scripts/exp_torchref_map.py) — use them only
  for throughput comparisons, never for the parity gate.
- Evaluator: in-repo COCOeval-protocol implementation (101-pt AP, area
  ranges, maxDets, crowd semantics — 12 golden protocol tests).
- Two-stack exactness of this exact pipeline (bucketed detjax vs a torch
  replica of the reference eval branch, mixed geometry, real JPEG decode)
  is gated at fp32 worst |Δ| ≤ 0.002 on all 12 stats in
  scripts/e2e_gate.py --gate torchref.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch-ckpt", required=True,
                    help="reference state_dict (.pt) with backbone+FPN+heads")
    ap.add_argument("--ann", required=True,
                    help="instances_val2017.json")
    ap.add_argument("--images", required=True, help="val2017 image dir")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--fixed-canvas", type=int, default=None,
                    choices=(640, 1024),
                    help="letterbox every image onto ONE static canvas "
                         "instead of the per-image protocol geometry — "
                         "faster, but NOT the reference's geometry (costs "
                         "up to 0.016 AP; never use for the parity gate)")
    ap.add_argument("--eval-1024", action="store_true",
                    help="deprecated alias for --fixed-canvas 1024")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--backbone-only", action="store_true",
                    help="import only the backbone (heads stay random — "
                         "debugging aid, NOT a parity run)")
    ap.add_argument("--reference-ap", type=float, default=None,
                    help="the reference's COCO AP@[.5:.95] (0..1 fraction, "
                         "e.g. 0.335). When given, the parity gate is "
                         "ASSERTED: |AP - reference_AP| must be <= "
                         "--tolerance or the script exits 1.")
    ap.add_argument("--tolerance", type=float, default=0.002,
                    help="parity tolerance as an AP fraction; the north "
                         "star's '±0.2 mAP points' = 0.002 (default)")
    ap.add_argument("--json-out", default=None,
                    help="write {'AP': ..., 'reference_AP': ..., 'delta': "
                         "..., 'pass': ...} to this path")
    ap.add_argument("--set", action="append", dest="overrides",
                    help="dotted config overrides, e.g. "
                         "model.image_size=(320,320) (rehearsal speed knob)")
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS even where a sitecustomize force-prefers a
    # backend (the parity rehearsal runs this script on CPU from the suite)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from detjax.config import get_config
    from detjax.data import CocoDataset
    import numpy as np
    from detjax.modeling import build_model
    from detjax.utils.torch_import import (
        import_detector_into_variables,
        import_into_variables,
        load_state_dict_file,
    )

    from detjax.cli.common import parse_overrides

    fixed = args.fixed_canvas or (1024 if args.eval_1024 else None)
    preset = "retinanet_r50_1024" if fixed == 1024 else "retinanet_r50_640"
    overrides = {"model.backbone_depth": args.depth}
    if fixed is None:
        # per-image protocol geometry (the parity default): the bucketed
        # evaluator reads min/max from eval_scale_minmax
        overrides["data.eval_scale_minmax"] = (608, 1024)
        # evaluator-grade candidate budget: the reference's eval branch
        # keeps EVERY score>0.05 (anchor, class) pair before per-class
        # NMS; the serving default (pre_nms_top_k=1000, anchor-first
        # two-stage) truncates dense mid-score regimes and measurably
        # costs recall there (torchref-mid gate: AR100 −0.027 at k=1000,
        # exact at the oracle). A parity run is correctness-first — pay
        # the global sort.
        overrides["eval.pre_nms_top_k"] = 16384
        overrides["eval.exact_candidates"] = True
    overrides.update(parse_overrides(args.overrides))
    cfg = get_config(preset, **overrides)
    print(f"preset={preset} depth={args.depth} geometry="
          + (f"fixed-{fixed}" if fixed else "protocol per-image 608/1024"))

    _, variables = build_model(cfg, jax.random.PRNGKey(0))
    sd = load_state_dict_file(args.torch_ckpt)
    importer = (import_into_variables if args.backbone_only
                else import_detector_into_variables)
    variables = importer(variables, sd, depth=args.depth)
    print(f"imported {'backbone' if args.backbone_only else 'full detector'} "
          f"from {args.torch_ckpt} ({len(sd)} tensors)")

    ds = CocoDataset(args.ann, args.images)
    # same machinery as run_coco_eval(_protocol), plus a detections
    # fingerprint (count + score sum) so the rehearsal can assert
    # cross-process determinism of the import->detect->NMS path
    from detjax.evaluation.coco_map import COCOMetric
    from detjax.evaluation.evaluator import _gt_provider, iter_detections
    from detjax.evaluation.protocol import iter_detections_protocol

    metric = COCOMetric(category_ids=list(range(cfg.model.num_classes)))
    gt_of = _gt_provider(ds)
    n_dets, score_sum = 0, 0.0
    detections = (
        iter_detections_protocol(variables, ds, cfg,
                                 max_images=args.max_images, verbose=True)
        if fixed is None else
        iter_detections(variables, ds, cfg, max_images=args.max_images))
    for img_id, boxes, scores, labels in detections:
        metric.add(img_id, gt_of(img_id), boxes, scores, labels)
        n_dets += int(len(scores))
        score_sum += float(np.sum(scores))
    res = metric.compute()
    for k, v in res.stats.items():
        print(f"{k:>6}: {v:.4f}")
    print(f"detections: {n_dets} (score sum {score_sum:.4f})")

    ap_val = float(res.stats["AP"])
    if args.json_out:
        import json

        payload = {"AP": ap_val, "num_detections": n_dets,
                   "score_sum": score_sum,
                   "reference_AP": args.reference_ap,
                   "delta": (None if args.reference_ap is None
                             else ap_val - args.reference_ap),
                   "tolerance": args.tolerance,
                   "pass": (None if args.reference_ap is None
                            else abs(ap_val - args.reference_ap)
                            <= args.tolerance)}
        with open(args.json_out, "w") as f:
            json.dump(payload, f)
        print(f"wrote {args.json_out}")

    if args.reference_ap is None:
        print("\nNo --reference-ap given: parity NOT asserted. The gate is "
              f"|AP - reference_AP| <= {args.tolerance} "
              "(north star: ±0.2 mAP points).")
        return

    delta = ap_val - args.reference_ap
    ok = abs(delta) <= args.tolerance
    print(f"\nParity gate: |{ap_val:.4f} - {args.reference_ap:.4f}| = "
          f"{abs(delta):.4f} {'<=' if ok else '>'} {args.tolerance:.4f} "
          f"-> {'PASS' if ok else 'FAIL'}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
