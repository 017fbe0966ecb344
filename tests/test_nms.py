"""NMS tests: numpy-reference differential (keep set + order) and the fused
class-aware postprocess (SURVEY.md §2 #12, §4.1)."""

import numpy as np
import jax.numpy as jnp

from detjax.ops.nms import nms_single_class, class_aware_nms, batched_detect_postprocess
from tests.np_ref import nms_np


def _boxes_scores(rng, n, span=200.0):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, (n,)).astype(np.float32)
    return boxes, scores


def test_nms_golden():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # heavy overlap with 0
        [50, 50, 60, 60],
        [0, 0, 10, 10],   # duplicate of 0, lower score
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.85], dtype=np.float32)
    r = nms_single_class(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4)
    idx = np.asarray(r.indices)
    assert list(idx[idx >= 0]) == [0, 2]
    assert int(r.num_valid) == 2


def test_nms_vs_numpy_keep_order(rng):
    for trial in range(5):
        boxes, scores = _boxes_scores(rng, 60)
        want = nms_np(boxes, scores, 0.5, max_output=20)
        r = nms_single_class(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
        got = [int(i) for i in np.asarray(r.indices) if i >= 0]
        assert got == want, f"trial {trial}: {got} != {want}"


def test_nms_ties_break_by_index():
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    scores = np.array([0.5, 0.5], dtype=np.float32)
    r = nms_single_class(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 2)
    assert list(np.asarray(r.indices)) == [0, 1]


def test_class_aware_nms_basic():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],
        [50, 50, 60, 60],
    ], dtype=np.float32)
    # class 0: boxes 0&1 overlap, keep higher; class 1: box 2
    scores = np.array([
        [0.9, 0.01],
        [0.8, 0.01],
        [0.01, 0.7],
    ], dtype=np.float32)
    det = class_aware_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          score_threshold=0.05, max_detections=10)
    n = int(det.num_valid)
    assert n == 2
    got = {(int(l), round(float(s), 4)) for l, s in
           zip(np.asarray(det.labels[:n]), np.asarray(det.scores[:n]))}
    assert got == {(0, 0.9), (1, 0.7)}


def test_class_aware_nms_vs_numpy(rng):
    n, k = 120, 6
    boxes, _ = _boxes_scores(rng, n)
    scores = rng.uniform(0, 1, (n, k)).astype(np.float32)
    det = class_aware_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          score_threshold=0.05, iou_threshold=0.5,
                          pre_nms_top_k=n, max_detections=n * k,
                          per_class_max=n)
    nv = int(det.num_valid)
    got = sorted(
        (int(det.labels[i]), round(float(det.scores[i]), 5),
         tuple(np.round(np.asarray(det.boxes[i]), 3)))
        for i in range(nv)
    )
    want = []
    for c in range(k):
        mask = scores[:, c] > 0.05
        idxs = np.where(mask)[0]
        keep = nms_np(boxes[idxs], scores[idxs, c], 0.5)
        for i in keep:
            gi = idxs[i]
            want.append((c, round(float(scores[gi, c]), 5),
                         tuple(np.round(boxes[gi], 3))))
    assert got == sorted(want)


def test_batched_postprocess_shapes(rng):
    b, a, k, d = 3, 50, 4, 10
    boxes = np.tile(_boxes_scores(rng, a)[0][None], (b, 1, 1))
    scores = rng.uniform(0, 1, (b, a, k)).astype(np.float32)
    det = batched_detect_postprocess(jnp.asarray(boxes), jnp.asarray(scores),
                                     max_detections=d, pre_nms_top_k=a)
    assert det.boxes.shape == (b, d, 4)
    assert det.scores.shape == (b, d)
    assert det.labels.shape == (b, d)
    assert det.num_valid.shape == (b,)
    # scores sorted descending within each image
    s = np.asarray(det.scores)
    for i in range(b):
        nv = int(det.num_valid[i])
        assert (np.diff(s[i, :nv]) <= 1e-6).all()


def test_two_stage_candidates_match_exact_on_peaked_scores(rng, monkeypatch):
    """Production anchor-first candidate selection must produce the same
    detections as the exact global top-k when scores are peaked (the
    realistic regime: few confident (anchor,class) pairs per image)."""
    from detjax.ops import nms as nms_mod
    from detjax.ops.nms import fused_detect_postprocess

    b, a, k = 2, 300, 8
    anchors = _boxes_scores(rng, a)[0]
    deltas = rng.normal(0, 0.3, (b, a, 4)).astype(np.float32)
    # mostly-background scores with a few confident detections
    scores = rng.uniform(0, 0.03, (b, a, k)).astype(np.float32)
    for bi in range(b):
        for _ in range(12):
            scores[bi, rng.integers(a), rng.integers(k)] = rng.uniform(0.4, 1)

    common = dict(image_size=(256, 256), num_candidates=64, max_detections=20)
    exact = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        exact=True, **common)
    monkeypatch.setattr(nms_mod, "_EXACT_PAIRS_MAX", 0)  # force two-stage
    fast = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        exact=False, **common)
    np.testing.assert_array_equal(np.asarray(fast.num_valid),
                                  np.asarray(exact.num_valid))
    nv = int(exact.num_valid[0])
    np.testing.assert_allclose(np.asarray(fast.scores[:, :nv]),
                               np.asarray(exact.scores[:, :nv]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fast.labels[:, :nv]),
                                  np.asarray(exact.labels[:, :nv]))


def test_logit_domain_selection_matches_probability_domain(rng, monkeypatch):
    """scores_are_logits=True must yield IDENTICAL detections to feeding
    sigmoid(logits): sigmoid is strictly monotone so top-k sets, labels and
    index tie-breaks agree; the threshold transports to logit(t). Checked on
    both the exact and the two-stage candidate branches, with bf16 logits
    (the production head dtype)."""
    import jax
    from detjax.ops import nms as nms_mod
    from detjax.ops.nms import fused_detect_postprocess

    b, a, k = 2, 300, 8
    anchors = _boxes_scores(rng, a)[0]
    deltas = rng.normal(0, 0.3, (b, a, 4)).astype(np.float32)
    logits = jnp.asarray(
        rng.normal(-3, 2.5, (b, a, k)).astype(np.float32)).astype(jnp.bfloat16)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))

    common = dict(image_size=(256, 256), num_candidates=64,
                  max_detections=20, score_threshold=0.05)
    for force_two_stage in (False, True):
        if force_two_stage:
            monkeypatch.setattr(nms_mod, "_EXACT_PAIRS_MAX", 0)
        ref = fused_detect_postprocess(
            jnp.asarray(deltas), jnp.asarray(anchors), probs, **common)
        out = fused_detect_postprocess(
            jnp.asarray(deltas), jnp.asarray(anchors), logits,
            scores_are_logits=True, **common)
        np.testing.assert_array_equal(np.asarray(out.num_valid),
                                      np.asarray(ref.num_valid))
        for i in range(b):
            nv = int(ref.num_valid[i])
            np.testing.assert_array_equal(np.asarray(out.labels[i, :nv]),
                                          np.asarray(ref.labels[i, :nv]))
            np.testing.assert_allclose(np.asarray(out.scores[i, :nv]),
                                       np.asarray(ref.scores[i, :nv]),
                                       rtol=0, atol=1e-6)
            np.testing.assert_allclose(np.asarray(out.boxes[i, :nv]),
                                       np.asarray(ref.boxes[i, :nv]),
                                       rtol=0, atol=1e-5)



def test_logit_domain_threshold_extremes(rng):
    """The probability→logit threshold transport must be exact at the
    extremes (ops/nms.py): t=0 keeps every pair (the sigmoid path's
    ``p > 0`` is always true — no hidden logit(1e-8) pre-suppression),
    t=1 keeps none. Regression for the clamp that silently suppressed
    pairs below logit≈-18.4 at t=0."""
    import jax
    from detjax.ops.nms import fused_detect_postprocess

    b, a, k = 1, 64, 4
    anchors = _boxes_scores(rng, a)[0]
    deltas = rng.normal(0, 0.3, (b, a, 4)).astype(np.float32)
    common = dict(image_size=(256, 256), num_candidates=32,
                  max_detections=16)

    # t=0: every pair must survive selection on BOTH paths. Logits kept
    # out of sigmoid saturation (|x|<16.6) — saturated blocks are exact
    # 0.0/1.0 ties in probability space where candidate ORDER legitimately
    # differs (documented caveat); the extremes property under test is the
    # thresholding, not tie order.
    logits = np.clip(rng.normal(0, 5, (b, a, k)), -12, 12).astype(np.float32)
    probs = jax.nn.sigmoid(jnp.asarray(logits))
    ref = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), probs,
        score_threshold=0.0, **common)
    out = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(logits),
        scores_are_logits=True, score_threshold=0.0, **common)
    np.testing.assert_array_equal(np.asarray(out.num_valid),
                                  np.asarray(ref.num_valid))
    nv = int(np.asarray(ref.num_valid)[0])
    assert nv == common["max_detections"] // 2 or nv > 0  # nothing suppressed
    np.testing.assert_array_equal(np.asarray(out.labels[0, :nv]),
                                  np.asarray(ref.labels[0, :nv]))

    # t=1: nothing survives on either path, even with +saturated logits
    # whose fp32 sigmoid is EXACTLY 1.0 (the old clamp passed these).
    sat = rng.normal(0, 30, (b, a, k)).astype(np.float32)
    for scores, is_logits in ((jax.nn.sigmoid(jnp.asarray(sat)), False),
                              (jnp.asarray(sat), True)):
        res = fused_detect_postprocess(
            jnp.asarray(deltas), jnp.asarray(anchors), scores,
            scores_are_logits=is_logits, score_threshold=1.0, **common)
        assert int(np.asarray(res.num_valid)[0]) == 0

def test_partial_topk_matches_exact_sort(rng, monkeypatch):
    """topk="partial" (TPU PartialReduce lowering; exact value multiset at
    recall 1.0) must give identical detections to topk="exact" on tie-free
    scores, on both candidate branches. Tie blocks may reorder on TPU —
    covered by the tie-aware e2e gates — but with distinct fp32 scores the
    selections must agree everywhere, including the CPU fallback lowering
    this test runs under."""
    import jax
    from detjax.ops import nms as nms_mod
    from detjax.ops.nms import fused_detect_postprocess

    b, a, k = 2, 300, 8
    anchors = _boxes_scores(rng, a)[0]
    deltas = rng.normal(0, 0.3, (b, a, 4)).astype(np.float32)
    # distinct fp32 logits: add a unique sub-bf16 dither per (anchor, class)
    logits = rng.normal(-3, 2.5, (b, a, k)).astype(np.float32)
    logits += np.arange(a * k, dtype=np.float32).reshape(1, a, k) * 1e-6
    logits = jnp.asarray(logits)

    common = dict(image_size=(256, 256), num_candidates=64,
                  max_detections=20, score_threshold=0.05,
                  scores_are_logits=True)
    for force_two_stage in (False, True):
        if force_two_stage:
            monkeypatch.setattr(nms_mod, "_EXACT_PAIRS_MAX", 0)
        ref = fused_detect_postprocess(
            jnp.asarray(deltas), jnp.asarray(anchors), logits,
            topk="exact", **common)
        out = fused_detect_postprocess(
            jnp.asarray(deltas), jnp.asarray(anchors), logits,
            topk="partial", **common)
        np.testing.assert_array_equal(np.asarray(out.num_valid),
                                      np.asarray(ref.num_valid))
        for i in range(b):
            nv = int(ref.num_valid[i])
            np.testing.assert_array_equal(np.asarray(out.labels[i, :nv]),
                                          np.asarray(ref.labels[i, :nv]))
            np.testing.assert_array_equal(np.asarray(out.scores[i, :nv]),
                                          np.asarray(ref.scores[i, :nv]))
            np.testing.assert_array_equal(np.asarray(out.boxes[i, :nv]),
                                          np.asarray(ref.boxes[i, :nv]))


def test_fused_postprocess_matches_per_class_path(rng):
    """Production fused path (global candidates + class-offset NMS) must give
    the same detections as the per-class reference path when the candidate
    set covers everything."""
    from detjax.ops.boxes import clip_boxes, decode_boxes
    from detjax.ops.nms import fused_detect_postprocess

    b, a, k = 2, 150, 5
    anchors = _boxes_scores(rng, a)[0]
    deltas = rng.normal(0, 0.3, (b, a, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (b, a, k)).astype(np.float32)

    fused = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        image_size=(256, 256), num_candidates=a * k, max_detections=40,
        exact=True)

    boxes = decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)[None])
    boxes = clip_boxes(boxes, (256, 256))
    ref = batched_detect_postprocess(
        boxes, jnp.asarray(scores), pre_nms_top_k=a, max_detections=40)

    for i in range(b):
        nf, nr = int(fused.num_valid[i]), int(ref.num_valid[i])
        assert nf == nr
        np.testing.assert_allclose(np.asarray(fused.scores[i, :nf]),
                                   np.asarray(ref.scores[i, :nr]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(fused.labels[i, :nf]),
                                      np.asarray(ref.labels[i, :nr]))
        np.testing.assert_allclose(np.asarray(fused.boxes[i, :nf]),
                                   np.asarray(ref.boxes[i, :nr]), atol=1e-3)
