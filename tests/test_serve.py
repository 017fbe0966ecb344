"""Serving-engine tests: micro-batcher coalescing/padding semantics and a
full HTTP round-trip through the fused detect path (detjax/serve.py —
production serving is a framework surface the reference lacks; SURVEY.md
§2 #19 covers only a per-image demo script)."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from detjax.config import get_config
from detjax.modeling import build_model
from detjax.serve import DetectionServer, MicroBatcher


def test_microbatcher_pads_and_coalesces():
    seen = []

    def run_batch(batch):
        seen.append(batch.copy())
        # per-slot result: the slot's mean pixel value
        return [float(batch[i].mean()) for i in range(batch.shape[0])]

    mb = MicroBatcher(run_batch, batch_size=4, canvas_hw=(8, 8),
                      max_wait_ms=50.0)
    canvases = [np.full((8, 8, 3), v, np.uint8) for v in (10, 20, 30)]
    results = [None] * 3

    def submit(i):
        results[i] = mb.submit(canvases[i])

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()

    assert sorted(results) == [10.0, 20.0, 30.0]
    # 3 concurrent requests coalesced into ≤3 device batches, all padded
    # to the static batch shape
    assert all(b.shape == (4, 8, 8, 3) for b in seen)
    assert sum((b.mean(axis=(1, 2, 3)) > 0).sum() for b in seen) == 3


def test_microbatcher_sheds_load_when_full():
    """A full admission queue rejects immediately (Overloaded → HTTP 503)
    instead of queueing unboundedly."""
    from detjax.serve import Overloaded

    release = threading.Event()

    def run_batch(batch):
        release.wait(10)
        return [0.0] * batch.shape[0]

    mb = MicroBatcher(run_batch, batch_size=1, canvas_hw=(4, 4),
                      max_wait_ms=1.0, max_queue_batches=1)
    canvas = np.zeros((4, 4, 3), np.uint8)
    # one in-flight (worker blocked) + one queued → queue full
    t1 = threading.Thread(target=mb.submit, args=(canvas,))
    t1.start()
    time.sleep(0.2)  # let the worker take the first request
    t2 = threading.Thread(target=mb.submit, args=(canvas,))
    t2.start()
    time.sleep(0.2)
    with pytest.raises(Overloaded):
        mb.submit(canvas)
    assert mb.rejected == 1
    release.set()
    t1.join(5)
    t2.join(5)
    assert mb.completed == 2
    mb.close()


def test_microbatcher_overlap_dispatch_before_finalize():
    """Split-phase engine: under a loaded queue the worker dispatches
    batch N+1 BEFORE finalizing batch N (serving overlap), and every
    request still gets its own batch's result."""
    import time

    events = []
    gate = threading.Event()

    def dispatch(batch):
        v = int(batch[0, 0, 0, 0])
        events.append(("d", v))
        gate.wait(10)  # hold the first dispatch until all are queued
        return v

    def finalize(handle, n):
        events.append(("f", handle))
        return [float(handle)] * n

    mb = MicroBatcher(lambda b: [0.0] * b.shape[0], batch_size=1,
                      canvas_hw=(4, 4), max_wait_ms=200.0,
                      dispatch=dispatch, finalize=finalize)
    outs = {}

    def hit(v):
        outs[v] = mb.submit(np.full((4, 4, 3), v, np.uint8))

    threads = [threading.Thread(target=hit, args=(v,)) for v in (1, 2, 3)]
    threads[0].start()
    time.sleep(0.3)  # worker takes #1, blocks in its dispatch
    threads[1].start()
    threads[2].start()
    time.sleep(0.3)  # #2/#3 queued behind the gated dispatch
    gate.set()
    for t in threads:
        t.join(10)
    mb.close()
    assert outs == {1: 1.0, 2: 2.0, 3: 3.0}
    # batch 2's dispatch must precede batch 1's finalize (the overlap)
    assert events.index(("d", 2)) < events.index(("f", 1)), events


def test_microbatcher_rejects_bad_canvas_without_wedging():
    mb = MicroBatcher(lambda b: [0.0] * b.shape[0], batch_size=2,
                      canvas_hw=(4, 4))
    with pytest.raises(ValueError, match="canvas must be uint8"):
        mb.submit(np.zeros((5, 4, 3), np.uint8))
    # worker is still alive and serving
    assert mb.submit(np.zeros((4, 4, 3), np.uint8)) == 0.0
    mb.close()


def test_microbatcher_propagates_errors():
    def run_batch(batch):
        raise RuntimeError("boom")

    mb = MicroBatcher(run_batch, batch_size=2, canvas_hw=(4, 4))
    with pytest.raises(RuntimeError, match="boom"):
        mb.submit(np.zeros((4, 4, 3), np.uint8))
    mb.close()


@pytest.fixture(scope="module")
def server():
    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    srv = DetectionServer(variables, cfg, engine="fp", batch_size=2,
                          max_wait_ms=1.0, score_threshold=0.0,
                          class_names=("a", "b", "c", "d"))
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=("127.0.0.1", 0, ready),
                         daemon=True)
    t.start()
    # serve() compiles the engine BEFORE binding (warmup-off-request-path);
    # a cold XLA cache on the 1-core box takes minutes, not seconds
    assert ready.wait(600)
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def _jpeg_bytes(h=90, w=120, seed=0) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    return buf.getvalue()


def test_http_healthz(server):
    url = f"http://127.0.0.1:{server.port}/healthz"
    with urllib.request.urlopen(url, timeout=30) as r:
        obj = json.loads(r.read())
    assert obj["status"] == "ok"
    assert obj["batch_size"] == 2 and obj["image_size"] == [64, 64]
    for counter in ("submitted", "completed", "rejected"):
        assert isinstance(obj[counter], int)


def test_http_detect_roundtrip(server):
    url = f"http://127.0.0.1:{server.port}/detect"
    req = urllib.request.Request(url, data=_jpeg_bytes(),
                                 headers={"Content-Type": "image/jpeg"})
    with urllib.request.urlopen(req, timeout=120) as r:
        obj = json.loads(r.read())
    dets = obj["detections"]
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {"box", "score", "label", "class"}
        x0, y0, x1, y1 = d["box"]
        # boxes come back in ORIGINAL (pre-letterbox) image coordinates,
        # clipped to the source bounds (90 high x 120 wide) — detections
        # touching the letterbox padding must not map outside the image
        assert 0 <= x0 <= x1 <= 120 and 0 <= y0 <= y1 <= 90
        assert d["class"] in ("a", "b", "c", "d")


def test_http_detect_concurrent(server):
    url = f"http://127.0.0.1:{server.port}/detect"
    outs = [None] * 4

    def hit(i):
        req = urllib.request.Request(url, data=_jpeg_bytes(seed=i))
        with urllib.request.urlopen(req, timeout=120) as r:
            outs[i] = json.loads(r.read())

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(o is not None and "detections" in o for o in outs)


def test_engine_variants_agree(tmp_path):
    """All three engines (fp / int8 / StableHLO artifact) serve through the
    same MicroBatcher interface and agree on the detection count for the
    same input (scores differ by quantization/relowering noise only)."""
    from detjax.export import save_detect

    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.dtype": "float32", "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    path = str(tmp_path / "detect.stablehlo")
    save_detect(path, variables, cfg, batch_size=2)
    # u8-signature artifact (normalization baked in): the server must
    # detect the uint8 input via load_detect().in_dtype and feed raw
    # canvases straight through (one dispatch, no normalize jit)
    path_u8 = str(tmp_path / "detect_u8.stablehlo")
    save_detect(path_u8, variables, cfg, batch_size=2, input_format="u8")

    canvas = np.random.default_rng(5).integers(0, 256, (64, 64, 3), np.uint8)
    # explicit uint8 calibration canvases (the --int8-calibrate path); the
    # int8 engine REQUIRES them — lazy first-request calibration is gone
    calib = np.random.default_rng(6).integers(0, 256, (3, 64, 64, 3),
                                              np.uint8)
    counts = {}
    for engine in ("fp", "int8", path, path_u8):
        srv = DetectionServer(variables, cfg, engine=engine, batch_size=2,
                              score_threshold=0.0,
                              calibration=calib if engine == "int8" else None)
        boxes, scores, labels, nv = srv.batcher.submit(canvas)
        counts[engine] = nv
        assert boxes.shape == (10, 4) and nv >= 0
        srv.batcher.close()
    assert counts["fp"] == counts[path]  # same graph, relowered
    assert counts["fp"] == counts[path_u8]

    with pytest.raises(ValueError, match="requires calibration"):
        DetectionServer(variables, cfg, engine="int8", batch_size=2,
                        score_threshold=0.0)
    with pytest.raises(ValueError, match="calibration must be"):
        DetectionServer(variables, cfg, engine="int8", batch_size=2,
                        calibration=np.zeros((2, 32, 32, 3), np.uint8))


def test_http_bad_requests(server):
    base = f"http://127.0.0.1:{server.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope", timeout=30)
    assert e.value.code == 404
    req = urllib.request.Request(f"{base}/detect", data=b"")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_canvas_bucketing_routes_by_image_size():
    """buckets=(32, 64): one compiled engine per canvas; a small image is
    served from the 32 canvas (4x less conv work), a large one from 64.
    Boxes still come back clipped to ORIGINAL image coordinates."""
    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    srv = DetectionServer(variables, cfg, engine="fp", batch_size=2,
                          score_threshold=0.0, buckets=(32, 64))
    assert [hw for hw, _ in srv._buckets] == [(32, 32), (64, 64)]
    small_b, large_b = (b for _, b in srv._buckets)

    def _jpeg(h, w):
        from PIL import Image
        buf = io.BytesIO()
        arr = np.random.default_rng(h).integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(buf, format="JPEG")
        return buf.getvalue()

    dets = srv.detect_bytes(_jpeg(30, 24))
    assert small_b.submitted == 1 and large_b.submitted == 0
    for d in dets:
        x0, y0, x1, y1 = d["box"]
        assert 0 <= x0 <= x1 <= 24 and 0 <= y0 <= y1 <= 30

    dets = srv.detect_bytes(_jpeg(90, 120))  # > both canvases: letterbox
    assert large_b.submitted == 1
    for d in dets:
        x0, y0, x1, y1 = d["box"]
        assert 0 <= x0 <= x1 <= 120 and 0 <= y0 <= y1 <= 90
    srv.shutdown()

    with pytest.raises(ValueError, match="fp or int8"):
        DetectionServer(variables, cfg, engine="/tmp/x.stablehlo",
                        buckets=(32, 64))


def test_mesh_sharded_serving_matches_single_device():
    """mesh=: one server process shards every dispatched batch over the
    8-device mesh (SPMD serving scale-out); detections match the
    single-device engine on the same canvases."""
    from detjax.parallel.mesh import make_mesh

    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.dtype": "float32", "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    canvas = np.random.default_rng(7).integers(0, 256, (64, 64, 3),
                                               np.uint8)

    single = DetectionServer(variables, cfg, engine="fp", batch_size=8,
                             score_threshold=0.0)
    rb, rs, rl, rn = single.batcher.submit(canvas)
    single.batcher.close()

    mesh = make_mesh()  # the 8 fake CPU devices (conftest)
    assert mesh.shape["data"] == 8
    srv = DetectionServer(variables, cfg, engine="fp", batch_size=8,
                          score_threshold=0.0, mesh=mesh)
    mb_, ms, ml, mn = srv.batcher.submit(canvas)
    srv.batcher.close()

    assert mn == rn
    np.testing.assert_allclose(mb_[:mn], rb[:rn], atol=1e-5)
    np.testing.assert_allclose(ms[:mn], rs[:rn], atol=1e-6)
    assert np.array_equal(ml[:mn], rl[:rn])

    with pytest.raises(ValueError, match="divisible"):
        DetectionServer(variables, cfg, engine="fp", batch_size=3,
                        mesh=mesh)
    with pytest.raises(ValueError, match="fp or int8"):
        DetectionServer(variables, cfg, engine="/tmp/x.stablehlo",
                        batch_size=8, mesh=mesh)


def test_mesh_sharded_serving_int8_smoke():
    """int8 + mesh: the quantized tree replicates onto the mesh and the
    engine serves sharded batches."""
    from detjax.parallel.mesh import make_mesh

    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.dtype": "float32", "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    calib = np.random.default_rng(6).integers(0, 256, (2, 64, 64, 3),
                                              np.uint8)
    srv = DetectionServer(variables, cfg, engine="int8", batch_size=8,
                          score_threshold=0.0, calibration=calib,
                          mesh=make_mesh())
    boxes, scores, labels, nv = srv.batcher.submit(
        np.zeros((64, 64, 3), np.uint8))
    assert boxes.shape == (10, 4) and nv >= 0
    srv.shutdown()


def test_canvas_bucketing_int8_recalibrates_per_bucket():
    """int8 + buckets: the SAME calibration canvases drive every bucket
    (host-resized per canvas), and each bucket serves detections."""
    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.dtype": "float32", "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    calib = np.random.default_rng(6).integers(0, 256, (2, 64, 64, 3),
                                              np.uint8)
    srv = DetectionServer(variables, cfg, engine="int8", batch_size=2,
                          score_threshold=0.0, buckets=(32, 64),
                          calibration=calib)
    for hw, batcher in srv._buckets:
        boxes, scores, labels, nv = batcher.submit(
            np.zeros((*hw, 3), np.uint8))
        assert boxes.shape == (10, 4) and nv >= 0
    srv.shutdown()
