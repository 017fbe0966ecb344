"""Data pipeline tests: loaders, transforms, iterator determinism, on-device
augmentation (SURVEY.md §4.5)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detjax.config import get_config
from detjax.data.coco import CocoDataset
from detjax.data.csv_dataset import CSVDataset
from detjax.data.pipeline import DetectionIterator, device_augment, make_train_iterator
from detjax.data.synthetic import SyntheticDetectionDataset
from detjax.data.transforms import (
    hflip_boxes,
    letterbox,
    pad_annotations,
    random_crop,
)


def test_letterbox_scales_and_pads():
    img = np.full((100, 200, 3), 255, np.uint8)
    boxes = np.asarray([[0, 0, 200, 100]], np.float32)
    canvas, out, scale = letterbox(img, boxes, (256, 256))
    assert canvas.shape == (256, 256, 3)
    assert np.isclose(scale, 256 / 200)
    # image occupies top-left 128 rows
    assert canvas[:128].mean() > 250
    assert canvas[129:].sum() == 0
    np.testing.assert_allclose(out[0], [0, 0, 256, 128], atol=0.5)


def test_protocol_scale_golden():
    """The reference Resizer rule (SURVEY.md §2 #14): scale = min(608/min
    side, 1024/max side), on representative val2017-like sizes."""
    from detjax.data.transforms import protocol_scale

    # typical val2017 landscape: short side governs
    assert np.isclose(protocol_scale(480, 640), 608 / 480)  # 1.2667
    # portrait is symmetric
    assert np.isclose(protocol_scale(640, 480), 608 / 480)
    # long side cap kicks in for elongated images
    assert np.isclose(protocol_scale(1000, 2000), 1024 / 2000)  # 0.512
    # small images UP-scale by the short-side rule
    assert np.isclose(protocol_scale(300, 400), 608 / 300)
    # square: short-side rule (608/700 < 1024/700)
    assert np.isclose(protocol_scale(700, 700), 608 / 700)
    # boundary: scale exactly 1 when min=608 and max<=1024
    assert np.isclose(protocol_scale(608, 1024), 1.0)


def test_letterbox_protocol_mode():
    """letterbox(scale_minmax=(608, 1024)) on the 1024 canvas reproduces
    the reference eval scale — NOT the canvas-fit scale."""
    img = np.full((480, 640, 3), 200, np.uint8)
    boxes = np.asarray([[0, 0, 640, 480]], np.float32)
    canvas, out, scale = letterbox(img, boxes, (1024, 1024),
                                   scale_minmax=(608, 1024))
    assert canvas.shape == (1024, 1024, 3)
    assert np.isclose(scale, 608 / 480)  # reference 1.2667, not 1.6
    nh, nw = round(480 * scale), round(640 * scale)
    assert canvas[:nh, :nw].mean() > 190
    assert canvas[nh + 1:, :].sum() == 0 and canvas[:, nw + 1:].sum() == 0
    np.testing.assert_allclose(out[0], [0, 0, nw, nh], atol=1.0)
    # canvas-fit cap still applies if the protocol scale would overflow a
    # smaller canvas (e.g. protocol rule on the 640 canvas)
    _, _, s640 = letterbox(img, boxes, (640, 640), scale_minmax=(608, 1024))
    assert np.isclose(s640, 640 / 640 * min(640 / 480, 640 / 640, 608 / 480))


def test_eval_iterator_uses_protocol_scale():
    """retinanet_r50_1024 preset wires eval_scale_minmax=(608,1024) into
    the eval iterator; a 480×640 record evaluates at 1.2667×."""
    from detjax.data.pipeline import make_eval_iterator

    class OneImage:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {"image": np.zeros((480, 640, 3), np.uint8),
                    "boxes": np.zeros((0, 4), np.float32),
                    "labels": np.zeros((0,), np.int32),
                    "image_id": 7}

    cfg = get_config("retinanet_r50_1024")
    batch = next(iter(make_eval_iterator(OneImage(), cfg)))
    assert np.isclose(batch["scale"][0], 608 / 480)
    # default 640 preset keeps canvas-fit behavior
    cfg640 = get_config("retinanet_r50_640")
    batch640 = next(iter(make_eval_iterator(OneImage(), cfg640)))
    assert np.isclose(batch640["scale"][0], 1.0)


def test_device_prefetch_passthrough():
    """device_prefetch is value-transparent (order + content), so wrapping
    the train iterator cannot perturb bit-exact resume."""
    from detjax.data.pipeline import device_prefetch

    batches = [{"images": np.full((2, 4, 4, 3), i, np.uint8),
                "gt_boxes": np.full((2, 3, 4), float(i), np.float32)}
               for i in range(5)]
    out = list(device_prefetch(iter(batches), size=1))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["images"]),
                                      batches[i]["images"])
        np.testing.assert_array_equal(np.asarray(b["gt_boxes"]),
                                      batches[i]["gt_boxes"])


def test_hflip_boxes_golden():
    boxes = np.asarray([[10, 20, 30, 40]], np.float32)
    out = hflip_boxes(boxes, 100)
    np.testing.assert_allclose(out[0], [70, 20, 90, 40])


def test_random_crop_keeps_covered_boxes(rng):
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.asarray([[10, 10, 30, 30], [80, 80, 99, 99]], np.float32)
    labels = np.asarray([1, 2], np.int32)
    crop, out_boxes, out_labels = random_crop(
        img, boxes, labels, rng, min_scale=0.5, max_scale=0.5)
    assert crop.shape[0] == 50 and crop.shape[1] == 50
    for b in out_boxes:
        assert (b[2] > b[0]) and (b[3] > b[1])
        assert b.min() >= 0 and b.max() <= 50


def test_pad_annotations():
    boxes = np.ones((3, 4), np.float32)
    labels = np.arange(3, dtype=np.int32)
    pb, pl = pad_annotations(boxes, labels, 5)
    assert pb.shape == (5, 4) and pl.shape == (5,)
    assert (pl[3:] == -1).all()
    pb, pl = pad_annotations(boxes, labels, 2)  # truncation
    assert pb.shape == (2, 4) and (pl >= 0).all()


def test_coco_json_loader(tmp_path):
    ann = {
        "images": [{"id": 7, "file_name": "a.jpg", "height": 50, "width": 60}],
        "annotations": [
            {"image_id": 7, "category_id": 18, "bbox": [10, 10, 20, 20],
             "iscrowd": 0, "area": 400},
            {"image_id": 7, "category_id": 44, "bbox": [0, 0, 0.5, 30]},  # degenerate
        ],
        "categories": [{"id": 18, "name": "dog"}, {"id": 44, "name": "bottle"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(ann))
    ds = CocoDataset(str(p), load_images=False)
    assert len(ds) == 1
    assert ds.num_classes == 2
    rec = ds[0]
    assert rec["image_id"] == 7
    np.testing.assert_allclose(rec["boxes"], [[10, 10, 30, 30]])  # xywh→xyxy
    assert rec["labels"].tolist() == [0]  # contiguous mapping (id 18 → 0)
    assert ds.label_to_cat_id[0] == 18


def test_csv_dataset(tmp_path):
    csvf = tmp_path / "ann.csv"
    csvf.write_text("img1.jpg,10,20,30,40,cat\nimg2.jpg,,,,,\n"
                    "img1.jpg,5,5,15,15,dog\n")
    cmap = tmp_path / "classes.csv"
    cmap.write_text("cat,0\ndog,1\n")
    ds = CSVDataset(str(csvf), str(cmap), load_images=False)
    assert len(ds) == 2
    rec = ds[0]  # img1 (sorted)
    assert rec["boxes"].shape == (2, 4)
    assert sorted(rec["labels"].tolist()) == [0, 1]
    rec2 = ds[1]
    assert rec2["boxes"].shape == (0, 4)


def test_synthetic_deterministic():
    ds = SyntheticDetectionDataset(num_images=4, seed=3)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["boxes"], b["boxes"])
    assert a["boxes"].shape[0] >= 1


def test_iterator_fixed_shapes_and_determinism():
    ds = SyntheticDetectionDataset(num_images=10, image_size=(96, 96))
    it1 = DetectionIterator(ds, 4, (128, 128), max_gt=6, seed=1, prefetch=0)
    it2 = DetectionIterator(ds, 4, (128, 128), max_gt=6, seed=1, prefetch=0)
    b1 = next(iter(it1))
    b2 = next(iter(it2))
    assert b1["images"].shape == (4, 128, 128, 3)
    assert b1["images"].dtype == np.uint8
    assert b1["gt_boxes"].shape == (4, 6, 4)
    assert b1["gt_labels"].shape == (4, 6)
    np.testing.assert_array_equal(b1["images"], b2["images"])
    np.testing.assert_array_equal(b1["gt_boxes"], b2["gt_boxes"])


def test_iterator_prefetch_matches_sync():
    ds = SyntheticDetectionDataset(num_images=12, image_size=(64, 64))
    sync = DetectionIterator(ds, 4, (64, 64), max_gt=6, seed=5, prefetch=0,
                             repeat=False)
    pre = DetectionIterator(ds, 4, (64, 64), max_gt=6, seed=5, prefetch=2,
                            repeat=False)
    bs_sync = list(sync)
    bs_pre = list(pre)
    assert len(bs_sync) == len(bs_pre) == 3
    for a, b in zip(bs_sync, bs_pre):
        np.testing.assert_array_equal(a["images"], b["images"])


def test_eval_iterator_partial_batch_padding():
    ds = SyntheticDetectionDataset(num_images=5, image_size=(64, 64))
    cfg = get_config("retinanet_r50_640", **{
        "model.image_size": (64, 64), "eval.batch_size": 4})
    from detjax.data.pipeline import make_eval_iterator
    batches = list(make_eval_iterator(ds, cfg))
    assert len(batches) == 2
    assert (batches[1]["image_id"][1:] == -1).all()  # filler marked


def test_device_augment_flip_consistency():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (4, 32, 48, 3)).astype(np.uint8)
    boxes = np.tile(np.asarray([[[4, 2, 10, 8]]], np.float32), (4, 1, 1))
    x, bx = device_augment(jnp.asarray(img), jnp.asarray(boxes),
                           jax.random.PRNGKey(1), hflip_prob=1.0)
    assert x.shape == (4, 32, 48, 3)
    # all flipped: boxes mirrored in width 48
    np.testing.assert_allclose(np.asarray(bx)[0, 0], [38, 2, 44, 8])
    # image flip: column j maps to 47-j after normalization
    xn = np.asarray(x)
    from detjax.data.transforms import normalize_image
    want = normalize_image(img[0])[:, ::-1]
    np.testing.assert_allclose(xn[0], want, atol=1e-5)


def test_device_augment_no_flip_identity():
    img = np.full((1, 8, 8, 3), 128, np.uint8)
    boxes = np.zeros((1, 2, 4), np.float32)
    x, bx = device_augment(jnp.asarray(img), jnp.asarray(boxes),
                           jax.random.PRNGKey(0), hflip_prob=0.0)
    np.testing.assert_array_equal(np.asarray(bx), boxes)
    from detjax.data.transforms import normalize_image
    np.testing.assert_allclose(np.asarray(x)[0], normalize_image(img[0]),
                               atol=1e-5)


def test_device_augment_out_dtype_bit_identical():
    """out_dtype=bf16 must equal fp32-normalize-then-cast exactly: the
    math stays fp32, only the output is cast — so feeding the model
    dtype from the normalize fusion is numerics-free (pipeline.py)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (2, 16, 24, 3)).astype(np.uint8)
    boxes = np.zeros((2, 1, 4), np.float32)
    x32, _ = device_augment(jnp.asarray(img), jnp.asarray(boxes),
                            jax.random.PRNGKey(7), hflip_prob=0.5)
    x16, _ = device_augment(jnp.asarray(img), jnp.asarray(boxes),
                            jax.random.PRNGKey(7), hflip_prob=0.5,
                            out_dtype=jnp.bfloat16)
    assert x16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(x32.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(x16, dtype=np.float32))


def test_threaded_iterator_deterministic_and_ordered():
    """workers>1 must preserve order and be run-to-run deterministic
    (per-example RNG keyed by (seed, epoch, index))."""
    from detjax.data.pipeline import DetectionIterator

    ds = SyntheticDetectionDataset(num_images=12, image_size=(64, 64),
                                   num_classes=3, max_objects=2)

    def batches(workers):
        it = DetectionIterator(ds, batch_size=4, image_size=(48, 48),
                               max_gt=4, shuffle=True, repeat=False,
                               seed=7, crop=True, prefetch=0,
                               workers=workers)
        return list(it)

    a = batches(3)
    b = batches(3)
    assert len(a) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["gt_boxes"], y["gt_boxes"])
        np.testing.assert_array_equal(x["image_id"], y["image_id"])
    # worker count must not change results AT ALL ((seed, epoch, index)-
    # keyed RNG in both paths): bit-identical batches for workers=1
    c = batches(1)
    for x, y in zip(a, c):
        np.testing.assert_array_equal(x["image_id"], y["image_id"])
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["gt_boxes"], y["gt_boxes"])


def test_sharded_iterator_partitions_dataset():
    from detjax.data.pipeline import DetectionIterator

    ds = SyntheticDetectionDataset(num_images=16, image_size=(64, 64),
                                   num_classes=3, max_objects=2)
    seen = []
    for shard in range(4):
        it = DetectionIterator(ds, batch_size=2, image_size=(48, 48),
                               max_gt=4, shuffle=True, repeat=False, seed=1,
                               prefetch=0, shard_index=shard, num_shards=4)
        for b in it:
            seen.extend(int(i) for i in b["image_id"])
    # disjoint cover of the dataset across shards
    assert sorted(seen) == list(range(16))


def test_prefetch_propagates_worker_exceptions():
    """A decode error must surface to the consumer, not truncate the
    stream silently (silent truncation => wrong mAP)."""
    from detjax.data.pipeline import DetectionIterator

    class Broken:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            if i == 3:
                raise IOError("corrupt image")
            return SyntheticDetectionDataset(
                num_images=6, image_size=(32, 32), num_classes=2)[i]

    it = DetectionIterator(Broken(), batch_size=2, image_size=(32, 32),
                           max_gt=2, shuffle=False, repeat=False,
                           prefetch=2)
    with pytest.raises(IOError, match="corrupt image"):
        list(it)


def test_prefetch_abandonment_does_not_deadlock():
    """Dropping the iterator early (max_images-style) must release the
    prefetch worker thread."""
    import threading

    from detjax.data.pipeline import DetectionIterator

    ds = SyntheticDetectionDataset(num_images=32, image_size=(32, 32),
                                   num_classes=2)
    before = threading.active_count()
    for _ in range(5):
        g = iter(DetectionIterator(ds, batch_size=2, image_size=(32, 32),
                                   max_gt=2, shuffle=False, repeat=True,
                                   prefetch=2))
        next(g)
        g.close()  # abandon mid-stream
    import time as _t

    deadline = _t.time() + 5.0
    while threading.active_count() > before and _t.time() < deadline:
        _t.sleep(0.05)
    assert threading.active_count() <= before + 1
