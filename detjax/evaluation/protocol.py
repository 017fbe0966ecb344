"""Variable-geometry protocol evaluation (SURVEY.md §2 #14, §3.2).

The reference evaluates val2017 at PER-IMAGE variable canvases: short side
scaled to 608 (capped so the long side ≤ 1024), bilinear resize, zero-pad
bottom/right to a multiple of 32. A fixed-canvas evaluator letterboxing
every image onto one static shape changes the conv border environment and
object-scale statistics — measured at worst |ΔAP| 0.016 for even the
mildest mismatch (608 content on a 640 canvas, scripts/exp_torchref_map.py)
— 8× the ±0.002 parity tolerance. This module closes that gap TPU-first:

  * The protocol canvas family is FINITE (short side ≈ 608, long side
    608..1024 rounded to 32, plus transposes): images are bucketed by
    their exact protocol canvas (``transforms.protocol_canvas``) and one
    fused detect engine is compiled per DISTINCT canvas — the same
    static-shape strategy as ``serve.py``'s per-bucket engines, so XLA
    never sees a dynamic shape and each image runs at the reference's
    exact geometry (zero extra pad ring, identical border environment).
  * Within a bucket, images batch to ``cfg.eval.batch_size`` and ride the
    same fused uint8→normalize→detect jit region as the fixed-canvas path
    (``modeling._detect_u8_fn``); the final partial batch pads by
    repeating (image_id −1 sentinel), exactly like the fixed-canvas
    evaluator.
  * Detections map back to original coordinates through the per-image
    protocol scale (the reference's ``1/resize_scale``).

Pixel-exactness of the canvases vs the reference Resizer is pinned in
tests/test_protocol_eval.py (byte-equal to the torch replica's
``resize_protocol_t``); end-to-end two-stack mAP exactness on mixed
geometry is gated in scripts/e2e_gate.py (torchref gates).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from detjax.config import Config
from detjax.data.transforms import letterbox_protocol, protocol_canvas
from detjax.evaluation.coco_map import COCOMetric, EvalResult
from detjax.evaluation.evaluator import _gt_provider, _images_disabled


def image_sizes(dataset) -> List[Tuple[int, int]]:
    """Per-index original (H, W) without decoding pixels where possible.

    CocoDataset: straight from the annotation JSON's image metadata.
    Datasets exposing ``load_images``: records with decode disabled.
    Anything else: records as-is (synthetic datasets generate cheaply).
    """
    imgs = getattr(dataset, "images", None)
    if isinstance(imgs, list) and imgs and "height" in imgs[0]:
        return [(int(i["height"]), int(i["width"])) for i in imgs]
    sizes = []
    with _images_disabled(dataset):
        for i in range(len(dataset)):
            sizes.append(tuple(dataset[i]["size"]))
    return sizes


def bucket_by_canvas(sizes: List[Tuple[int, int]], min_side: int,
                     max_side: int, pad_stride: int = 32
                     ) -> Dict[Tuple[int, int], List[int]]:
    """Group image indices by their exact protocol canvas shape."""
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for idx, (h, w) in enumerate(sizes):
        hw, _ = protocol_canvas(h, w, min_side, max_side, pad_stride)
        buckets.setdefault(hw, []).append(idx)
    return buckets


def _bucket_cfg(cfg: Config, canvas_hw: Tuple[int, int]) -> Config:
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_size=canvas_hw))


def iter_detections_protocol(
    variables, dataset, cfg: Config,
    max_images: Optional[int] = None,
    detect_fn_for: Optional[Callable[[Config], Callable]] = None,
    pad_stride: int = 32,
    verbose: bool = False,
):
    """Yield ``(image_id, boxes, scores, labels)`` per image in ORIGINAL
    coordinates, each image evaluated at its exact reference-protocol
    canvas (min/max sides from ``cfg.data.eval_scale_minmax``, default
    (608, 1024)).

    ``detect_fn_for(bucket_cfg) -> fn(variables, canvases_u8)`` overrides
    the per-bucket engine (e.g. the int8 PTQ path); default is the fused
    fp uint8 detect (``modeling._detect_u8_fn``).
    """
    from detjax.modeling import _detect_u8_fn

    minmax = tuple(cfg.data.eval_scale_minmax) or (608, 1024)
    sizes = image_sizes(dataset)
    n = len(sizes) if max_images is None else min(max_images, len(sizes))
    buckets = bucket_by_canvas(sizes[:n], *minmax, pad_stride)
    bs = cfg.eval.batch_size

    def batches():
        from concurrent.futures import ThreadPoolExecutor

        # decode + letterbox threads (PIL/libjpeg and the native resize
        # release the GIL — same worker model as data.DetectionIterator)
        workers = max(1, cfg.data.host_workers)

        def load(i, hw):
            rec = dataset[i]
            canvas, _, scale = letterbox_protocol(
                rec["image"], rec["boxes"], hw, *minmax)
            return canvas, int(rec["image_id"]), scale

        with ThreadPoolExecutor(workers) as pool:
            for hw in sorted(buckets):
                bcfg = _bucket_cfg(cfg, hw)
                detect = (detect_fn_for(bcfg) if detect_fn_for is not None
                          else _detect_u8_fn(bcfg))
                idxs = buckets[hw]
                if verbose:
                    print(f"  protocol bucket {hw[0]}x{hw[1]}: "
                          f"{len(idxs)} images", flush=True)
                for start in range(0, len(idxs), bs):
                    chunk = idxs[start:start + bs]
                    loaded = list(pool.map(lambda i: load(i, hw), chunk))
                    canvases = [c for c, _, _ in loaded]
                    ids = [i for _, i, _ in loaded]
                    scales = [s for _, _, s in loaded]
                    while len(canvases) < bs:  # static batch shape
                        canvases.append(canvases[-1])
                        ids.append(-1)
                        scales.append(1.0)
                    # jit dispatch is async — handles return immediately
                    yield detect(variables, np.stack(canvases)), ids, scales

    def finalize(det, ids, scales):
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        num_valid = np.asarray(det.num_valid)
        for j, img_id in enumerate(ids):
            if img_id < 0:  # partial-batch padding
                continue
            nv = int(num_valid[j])
            yield (img_id, boxes[j, :nv] / scales[j], scores[j, :nv],
                   labels[j, :nv])

    # split-phase overlap (same pattern as evaluator.iter_detections):
    # batch N+1 dispatches before batch N's results are pulled to host.
    pending = None
    for item in batches():
        if pending is not None:
            yield from finalize(*pending)
        pending = item
    if pending is not None:
        yield from finalize(*pending)


def run_coco_eval_protocol(
    variables, dataset, cfg: Config,
    max_images: Optional[int] = None,
    detect_fn_for: Optional[Callable[[Config], Callable]] = None,
    pad_stride: int = 32,
    verbose: bool = False,
) -> EvalResult:
    """COCO bbox metrics with every image at its reference-protocol
    canvas — the production evaluator for the val2017 parity run
    (scripts/coco_parity.py). Returns :class:`EvalResult`."""
    gt_of = _gt_provider(dataset)
    metric = COCOMetric(
        category_ids=list(range(cfg.model.num_classes)))
    for img_id, boxes, scores, labels in iter_detections_protocol(
            variables, dataset, cfg, max_images,
            detect_fn_for=detect_fn_for, pad_stride=pad_stride,
            verbose=verbose):
        metric.add(img_id, gt_of(img_id), boxes, scores, labels)
    return metric.compute()
