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
- Resolution: the reference evaluates variable min-608/max-1024
  (SURVEY.md §2 #14); --eval-1024 letterboxes to the 1024 canvas
  (retinanet_r50_1024 preset) so every val2017 image fits at its
  reference scale. Default is the 640 train canvas (faster, slightly
  lower AP).
- Evaluator: in-repo COCOeval-protocol implementation (101-pt AP, area
  ranges, maxDets, crowd semantics — 12 golden protocol tests).
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
    ap.add_argument("--eval-1024", action="store_true",
                    help="evaluate at the reference's 1024 protocol canvas")
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--backbone-only", action="store_true",
                    help="import only the backbone (heads stay random — "
                         "debugging aid, NOT a parity run)")
    args = ap.parse_args()

    import jax

    from detjax.config import get_config
    from detjax.data import CocoDataset
    from detjax.evaluation import run_coco_eval
    from detjax.modeling import build_model
    from detjax.utils.torch_import import (
        import_detector_into_variables,
        import_into_variables,
        load_state_dict_file,
    )

    preset = "retinanet_r50_1024" if args.eval_1024 else "retinanet_r50_640"
    cfg = get_config(preset, **{"model.backbone_depth": args.depth})
    print(f"preset={preset} depth={args.depth}")

    _, variables = build_model(cfg, jax.random.PRNGKey(0))
    sd = load_state_dict_file(args.torch_ckpt)
    importer = (import_into_variables if args.backbone_only
                else import_detector_into_variables)
    variables = importer(variables, sd, depth=args.depth)
    print(f"imported {'backbone' if args.backbone_only else 'full detector'} "
          f"from {args.torch_ckpt} ({len(sd)} tensors)")

    ds = CocoDataset(args.ann, args.images)
    res = run_coco_eval(variables, ds, cfg, max_images=args.max_images)
    for k, v in res.stats.items():
        print(f"{k:>6}: {v:.4f}")
    print("\nParity gate: |AP - reference_AP| <= 0.002 (mAP points: 0.2)")


if __name__ == "__main__":
    main()
