"""End-to-end COCO evaluation loop (SURVEY.md §3.3).

The reference's ``evaluate_coco`` runs the model image-by-image (bs=1) with
a per-class Python NMS loop, dumps JSON, and calls pycocotools. Here the
model+postprocess run BATCHED inside one jit (fused decode/NMS never leaves
the chip), the device→host transfer is just [B, 100] final detections, and
mAP comes from the in-repo COCOeval-compatible evaluator — detections are
mapped back to original image coordinates through the letterbox scale, so
numbers are comparable to pycocotools on the same boxes.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from detjax.config import Config
from detjax.data.pipeline import device_augment, make_eval_iterator
from detjax.evaluation.coco_map import COCOMetric, EvalResult, GroundTruth
from detjax.modeling import _detect_fn, _detect_u8_fn


import contextlib


@contextlib.contextmanager
def _images_disabled(dataset):
    """Temporarily skip image decode for annotation-only record access
    (CSVDataset and CocoDataset expose ``load_images``)."""
    if hasattr(dataset, "load_images"):
        old = dataset.load_images
        dataset.load_images = False
        try:
            yield
        finally:
            dataset.load_images = old
    else:
        yield


def _gt_provider(dataset) -> Callable[[int], GroundTruth]:
    """image_id → GroundTruth in ORIGINAL image coordinates."""
    if hasattr(dataset, "load_annotations"):
        def coco_gt(image_id: int) -> GroundTruth:
            a = dataset.load_annotations(image_id)
            return GroundTruth(boxes=a["boxes"], labels=a["labels"],
                               iscrowd=a["iscrowd"], areas=a["areas"])
        return coco_gt

    index = {}
    with _images_disabled(dataset):
        for i in range(len(dataset)):
            index[dataset[i]["image_id"]] = i

    def generic_gt(image_id: int) -> GroundTruth:
        with _images_disabled(dataset):
            rec = dataset[index[image_id]]
        return GroundTruth(boxes=rec["boxes"], labels=rec["labels"],
                           iscrowd=rec.get("iscrowd"), areas=rec.get("areas"))
    return generic_gt


def iter_detections(variables, dataset, cfg: Config,
                    max_images: Optional[int] = None,
                    detect_fn: Optional[Callable] = None,
                    mesh=None):
    """Yield ``(image_id, boxes, scores, labels)`` per image in ORIGINAL
    image coordinates, running the fused batched detect path.

    ``detect_fn(variables, images) -> Detections`` overrides the standard
    path (e.g. the int8 engine: ``lambda _, x: quant.detect_int8(qtree, x,
    cfg)``).

    ``mesh``: shard each eval batch over the mesh's ``data`` axis before
    dispatch (config 5's periodic mAP eval rides the same SPMD partition
    as the pjit train step — eval batch size must be divisible by the
    mesh size). Detections gather back on host fetch."""
    detect = detect_fn if detect_fn is not None else _detect_fn(cfg)
    # default fp path over uint8 batches: fused normalize+detect, one jit
    # region (modeling._detect_u8_fn). Injected detect_fns (int8 engine,
    # artifacts) keep the normalized-images contract.
    detect_u8 = _detect_u8_fn(cfg) if detect_fn is None else None
    zeros_rng = jax.random.PRNGKey(0)

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # On a 2-D (data, space) mesh, image ROWS shard over 'space' too:
        # the conv stack runs spatially partitioned (GSPMD halo exchange) —
        # the large-canvas eval scale-out (e.g. the 1024-px protocol).
        spec = (P("data", "space") if "space" in mesh.axis_names
                else P("data"))
        shard = NamedSharding(mesh, spec)

    if mesh is not None:
        from detjax.parallel.mesh import _mesh_context

        mesh_ctx = _mesh_context(mesh)
    else:
        mesh_ctx = contextlib.nullcontext

    def dispatch(batch):
        # jit dispatch is async: returns device handles immediately.
        # Spatial meshes install the abstract-mesh context so the model's
        # layout rule (models/spatial.py) sees the 'space' axis.
        with mesh_ctx():
            imgs = (jax.device_put(batch["images"], shard)
                    if shard is not None else jnp.asarray(batch["images"]))
            if imgs.dtype == jnp.uint8:
                if detect_u8 is not None:
                    return detect_u8(variables, imgs)
                b = imgs.shape[0]
                imgs, _ = device_augment(
                    imgs, jnp.zeros((b, 1, 4), jnp.float32), zeros_rng,
                    hflip_prob=0.0, mean=cfg.data.mean, std=cfg.data.std,
                    out_dtype=cfg.model.dtype)
            return detect(variables, imgs)

    def finalize(det, batch):
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        num_valid = np.asarray(det.num_valid)
        for i in range(len(batch["image_id"])):
            img_id = int(batch["image_id"][i])
            if img_id < 0:  # padding of the final partial batch
                continue
            scale = float(batch["scale"][i])
            nv = int(num_valid[i])
            yield (img_id, boxes[i, :nv] / scale, scores[i, :nv],
                   labels[i, :nv])

    # split-phase overlap (same pattern as serve.MicroBatcher): batch N+1
    # is DISPATCHED before batch N's results are pulled to host, so the
    # device computes N+1 while the host converts, matches and decodes N.
    n_done = 0
    n_dispatched = 0  # upper bound on yieldable images already in flight
    pending = None
    for batch in make_eval_iterator(dataset, cfg):
        if max_images is not None and n_dispatched >= max_images:
            break  # enough images in flight — don't burn a batch of compute
        det = dispatch(batch)
        n_dispatched += len(batch["image_id"])
        if pending is not None:
            for item in finalize(*pending):
                yield item
                n_done += 1
                if max_images is not None and n_done >= max_images:
                    return
        pending = (det, batch)
    if pending is not None:
        for item in finalize(*pending):
            yield item
            n_done += 1
            if max_images is not None and n_done >= max_images:
                return


def run_coco_eval(variables, dataset, cfg: Config,
                  max_images: Optional[int] = None,
                  detect_fn: Optional[Callable] = None,
                  mesh=None) -> EvalResult:
    """Run detection over ``dataset`` and compute COCO bbox metrics.

    Returns :class:`EvalResult`; ``result["AP"]`` is mAP@[.5:.95].
    ``mesh`` shards eval batches over the data axis (see
    :func:`iter_detections`).
    """
    gt_of = _gt_provider(dataset)
    metric = COCOMetric(category_ids=list(range(cfg.model.num_classes)))
    for img_id, boxes, scores, labels in iter_detections(
            variables, dataset, cfg, max_images, detect_fn=detect_fn,
            mesh=mesh):
        metric.add(img_id, gt_of(img_id), boxes, scores, labels)
    return metric.compute()


def run_voc_eval(variables, dataset, cfg: Config,
                 iou_threshold: float = 0.5,
                 max_images: Optional[int] = None):
    """VOC-style per-class AP over ``dataset`` (the reference lineage's
    csv_eval protocol — SURVEY.md §2 #18). Returns {"mAP", "AP/<class>"}."""
    from detjax.evaluation.voc import evaluate_voc

    gt_of = _gt_provider(dataset)
    gts, dets = {}, {}
    for img_id, boxes, scores, labels in iter_detections(
            variables, dataset, cfg, max_images):
        g = gt_of(img_id)
        gts[img_id] = {"boxes": g.boxes, "labels": g.labels}
        dets[img_id] = {"boxes": boxes, "scores": scores, "labels": labels}
    return evaluate_voc(gts, dets, num_classes=cfg.model.num_classes,
                        iou_threshold=iou_threshold,
                        class_names=getattr(dataset, "class_names", None))
