#!/usr/bin/env python
"""Materialize a synthetic detection dataset as real JPEG files + COCO JSON.

Gives the input pipeline a genuine file-backed workload (decode → letterbox
→ batch) for end-to-end training measurements where no real COCO exists on
the box (SURVEY.md §6; VERDICT round-1 missing #2).

Usage: python scripts/make_file_dataset.py --out /tmp/filecoco --images 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    from PIL import Image

    img_dir = os.path.join(args.out, "images")
    ann_dir = os.path.join(args.out, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(args.images):
        h = int(rng.integers(args.min_side, args.max_side + 1))
        w = int(rng.integers(args.min_side, args.max_side + 1))
        # photographic-ish background: low-freq gradients + noise
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([
            (xx * rng.uniform(0.1, 0.5) + yy * rng.uniform(0.0, 0.3)) % 256,
            (yy * rng.uniform(0.1, 0.5)) % 256,
            ((xx + yy) * rng.uniform(0.05, 0.3)) % 256,
        ], axis=-1)
        img = np.clip(base + rng.normal(0, 10, base.shape), 0, 255)
        n_obj = int(rng.integers(1, args.max_objects + 1))
        anns_this = []
        for _ in range(n_obj):
            bw = float(rng.uniform(24, w * 0.5))
            bh = float(rng.uniform(24, h * 0.5))
            x0 = float(rng.uniform(0, w - bw))
            y0 = float(rng.uniform(0, h - bh))
            cat = int(rng.integers(1, args.classes + 1))
            # paint the object: solid class-colored rectangle with border
            c = np.array([((cat * 37) % 200) + 55, ((cat * 91) % 200) + 55,
                          ((cat * 151) % 200) + 55], np.float32)
            img[int(y0):int(y0 + bh), int(x0):int(x0 + bw)] = c
            anns_this.append({
                "id": ann_id, "image_id": i + 1, "category_id": cat,
                "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0,
            })
            ann_id += 1
        fname = f"{i + 1:012d}.jpg"
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(img_dir, fname), "JPEG", quality=90)
        images.append({"id": i + 1, "file_name": fname,
                       "height": h, "width": w})
        annotations.extend(anns_this)

    meta = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"class_{c}"}
                       for c in range(1, args.classes + 1)],
    }
    with open(os.path.join(ann_dir, "instances_train.json"), "w") as f:
        json.dump(meta, f)
    print(f"wrote {args.images} JPEGs + COCO JSON to {args.out}")


if __name__ == "__main__":
    main()
