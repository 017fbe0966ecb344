#!/usr/bin/env python
"""Materialize a synthetic detection dataset as real JPEG files + COCO JSON.

Gives the input pipeline a genuine file-backed workload (decode → letterbox
→ batch) for end-to-end training measurements where no real COCO exists on
the box (SURVEY.md §6; VERDICT round-1 missing #2). Also imported by
``scripts/parity_rehearsal.py`` to dress-rehearse the mAP parity runbook.

Usage: python scripts/make_file_dataset.py --out /tmp/filecoco --images 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_file_dataset(out: str, images: int = 256, classes: int = 80,
                       min_side: int = 480, max_side: int = 640,
                       max_objects: int = 12, seed: int = 0) -> str:
    """Write ``images`` JPEGs + a COCO ``instances_train.json`` under
    ``out``; returns the annotation JSON path."""
    from PIL import Image

    img_dir = os.path.join(out, "images")
    ann_dir = os.path.join(out, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    image_recs, annotations = [], []
    ann_id = 1
    for i in range(images):
        h = int(rng.integers(min_side, max_side + 1))
        w = int(rng.integers(min_side, max_side + 1))
        # photographic-ish background: low-freq gradients + noise
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([
            (xx * rng.uniform(0.1, 0.5) + yy * rng.uniform(0.0, 0.3)) % 256,
            (yy * rng.uniform(0.1, 0.5)) % 256,
            ((xx + yy) * rng.uniform(0.05, 0.3)) % 256,
        ], axis=-1)
        img = np.clip(base + rng.normal(0, 10, base.shape), 0, 255)
        n_obj = int(rng.integers(1, max_objects + 1))
        for _ in range(n_obj):
            bw = float(rng.uniform(24, w * 0.5))
            bh = float(rng.uniform(24, h * 0.5))
            x0 = float(rng.uniform(0, w - bw))
            y0 = float(rng.uniform(0, h - bh))
            cat = int(rng.integers(1, classes + 1))
            # paint the object: solid class-colored rectangle with border
            c = np.array([((cat * 37) % 200) + 55, ((cat * 91) % 200) + 55,
                          ((cat * 151) % 200) + 55], np.float32)
            img[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] = c
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cat,
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
        fname = f"{i + 1:012d}.jpg"
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(img_dir, fname), "JPEG", quality=90)
        image_recs.append({"id": i + 1, "file_name": fname,
                           "height": h, "width": w})

    meta = {
        "images": image_recs,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"class_{c}"}
                       for c in range(1, classes + 1)],
    }
    ann_path = os.path.join(ann_dir, "instances_train.json")
    with open(ann_path, "w") as f:
        json.dump(meta, f)
    print(f"wrote {images} JPEGs + COCO JSON to {out}")
    return ann_path


def dump_dataset_as_coco(ds, out: str, quality: int = 95) -> str:
    """Materialize ANY record dataset (e.g. SyntheticDetectionDataset) as
    real JPEG files + a COCO annotation JSON under ``out`` — so parity
    gates can feed detjax's PRODUCTION loader (CocoDataset + in-repo
    libjpeg decode) and a torch replica (PIL decode) from the same bytes
    on disk (VERDICT r4 next #2: the last production segment, decode,
    exercised in a two-stack mAP run).

    Category ids equal the dataset's 0-based labels, so CocoDataset's
    sorted-id→contiguous mapping is the identity and model labels line up
    on both stacks. Idempotent: an existing annotation JSON is reused.
    Returns the annotation JSON path (images land in ``out``/images)."""
    from PIL import Image

    img_dir = os.path.join(out, "images")
    ann_dir = os.path.join(out, "annotations")
    ann_path = os.path.join(ann_dir, "instances.json")
    if os.path.exists(ann_path):
        return ann_path
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    image_recs, annotations = [], []
    ann_id = 1
    num_classes = len(ds.class_names)
    for i in range(len(ds)):
        rec = ds[i]
        h, w = rec["image"].shape[:2]
        fname = f"{int(rec['image_id']):012d}.jpg"
        # subsampling=0 (4:4:4): chroma is the class signal in synthetic
        # scenes; 4:2:0 would blur the color edges GT boxes sit on
        Image.fromarray(rec["image"]).save(
            os.path.join(img_dir, fname), "JPEG", quality=quality,
            subsampling=0)
        image_recs.append({"id": int(rec["image_id"]), "file_name": fname,
                           "height": h, "width": w})
        for b, l, c, a in zip(rec["boxes"], rec["labels"],
                              rec["iscrowd"], rec["areas"]):
            x0, y0, x1, y1 = (float(v) for v in b)
            annotations.append({
                "id": ann_id, "image_id": int(rec["image_id"]),
                "category_id": int(l),
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "area": float(a), "iscrowd": int(c)})
            ann_id += 1
    with open(ann_path, "w") as f:
        json.dump({"images": image_recs, "annotations": annotations,
                   "categories": [{"id": c, "name": f"class_{c}"}
                                  for c in range(num_classes)]}, f)
    print(f"dumped {len(ds)} JPEGs + COCO JSON to {out}")
    return ann_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--classes", type=int, default=80)
    ap.add_argument("--min-side", type=int, default=480)
    ap.add_argument("--max-side", type=int, default=640)
    ap.add_argument("--max-objects", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    write_file_dataset(args.out, args.images, args.classes, args.min_side,
                       args.max_side, args.max_objects, args.seed)


if __name__ == "__main__":
    main()
