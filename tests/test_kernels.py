"""Pallas kernel tests (interpret mode on CPU): the kernels must reproduce
the lax reference implementations element-for-element (SURVEY.md §7 "diff
against lax fallback bit-for-bit on keep sets")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detjax.kernels.postprocess import decode_boxes_pallas, nms_pallas
from detjax.ops.boxes import clip_boxes, decode_boxes
from detjax.ops.nms import NEG_INF, _greedy_nms_single, fused_detect_postprocess


def _random_candidates(rng, b=2, n=200, k=6, size=256.0):
    cxcy = rng.uniform(20, size - 20, (b, n, 2))
    wh = rng.uniform(5, 60, (b, n, 2))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)
    scores = rng.uniform(0.01, 1.0, (b, n)).astype(np.float32)
    labels = rng.integers(0, k, (b, n)).astype(np.int32)
    return boxes.astype(np.float32), scores, labels


def test_nms_pallas_matches_lax(rng):
    boxes, scores, labels = _random_candidates(rng)
    off = 300.0
    ki, ks = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(labels), iou_threshold=0.5, max_det=50,
                        class_offset=off, interpret=True)
    off_boxes = jnp.asarray(boxes) + (
        jnp.asarray(labels, jnp.float32) * off)[..., None]
    ref_i, ref_s = jax.vmap(
        lambda bb, ss: _greedy_nms_single(bb, ss, 0.5, 50)
    )(off_boxes, jnp.asarray(scores))
    np.testing.assert_array_equal(np.asarray(ki), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(ks), np.asarray(ref_s), atol=1e-6)


def test_nms_pallas_presuppressed_and_empty(rng):
    boxes, scores, labels = _random_candidates(rng, b=1, n=64, k=3)
    scores[0, ::2] = NEG_INF  # pre-suppressed entries must never surface
    ki, ks = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(labels), max_det=30, interpret=True)
    sel = np.asarray(ki[0])
    assert (sel[sel >= 0] % 2 == 1).all()
    # fully-suppressed image → all -1
    ki2, ks2 = nms_pallas(jnp.asarray(boxes),
                          jnp.full_like(jnp.asarray(scores), NEG_INF),
                          jnp.asarray(labels), max_det=30, interpret=True)
    assert (np.asarray(ki2) == -1).all()
    assert (np.asarray(ks2) == 0).all()


def test_decode_pallas_matches_lax(rng):
    b, n = 2, 300
    anchors = _random_candidates(rng, b=1, n=n)[0][0]
    deltas = rng.normal(0, 0.4, (b, n, 4)).astype(np.float32)
    got = decode_boxes_pallas(jnp.asarray(deltas), jnp.asarray(anchors),
                              image_size=(256, 256), interpret=True)
    want = clip_boxes(decode_boxes(jnp.asarray(deltas),
                                   jnp.asarray(anchors)[None]), (256, 256))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_decode_pallas_unclipped(rng):
    n = 150
    anchors = _random_candidates(rng, b=1, n=n)[0][0]
    deltas = rng.normal(0, 0.4, (1, n, 4)).astype(np.float32)
    got = decode_boxes_pallas(jnp.asarray(deltas), jnp.asarray(anchors),
                              interpret=True)
    want = decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)[None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_match_iou_pallas_matches_lax(rng):
    from detjax.kernels.matching import match_iou_pallas
    from detjax.ops.matching import match_anchors

    b, a, g = 3, 500, 7
    anchors = _random_candidates(rng, b=1, n=a)[0][0]
    gt = _random_candidates(rng, b=b, n=g)[0]
    labels = rng.integers(0, 5, (b, g)).astype(np.int32)
    labels[:, -2:] = -1  # padding
    labels[1, :] = -1  # one image with no GT at all

    iou, idx, mboxes, mlabels = match_iou_pallas(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray(labels) >= 0,
        jnp.asarray(labels), tile=256, interpret=True)
    ref = match_anchors(jnp.asarray(anchors), jnp.asarray(gt),
                        jnp.asarray(labels), backend="lax")
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref.max_iou),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.matched_gt))
    # kernel-extracted targets == gathered targets at the argmax slots
    want_boxes = np.take_along_axis(gt, np.asarray(idx)[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(mboxes), want_boxes, atol=1e-6)
    want_labels = np.take_along_axis(labels, np.asarray(idx), axis=1)
    np.testing.assert_array_equal(np.asarray(mlabels), want_labels)


def test_match_anchors_pallas_backend_full_result(rng):
    from detjax.ops import matching as matching_mod
    from detjax.ops.matching import match_anchors

    b, a, g = 2, 300, 5
    anchors = _random_candidates(rng, b=1, n=a)[0][0]
    gt = _random_candidates(rng, b=b, n=g)[0]
    labels = rng.integers(0, 4, (b, g)).astype(np.int32)
    labels[:, -1] = -1
    # force the pallas path even off-TPU (interpret picks up automatically)
    got = match_anchors(jnp.asarray(anchors), jnp.asarray(gt),
                        jnp.asarray(labels), backend="pallas")
    want = match_anchors(jnp.asarray(anchors), jnp.asarray(gt),
                         jnp.asarray(labels), backend="lax")
    np.testing.assert_array_equal(np.asarray(got.positive),
                                  np.asarray(want.positive))
    np.testing.assert_array_equal(np.asarray(got.negative),
                                  np.asarray(want.negative))
    np.testing.assert_array_equal(np.asarray(got.matched_labels),
                                  np.asarray(want.matched_labels))
    np.testing.assert_allclose(np.asarray(got.matched_boxes),
                               np.asarray(want.matched_boxes), atol=1e-6)


def test_fused_postprocess_pallas_backend_matches_lax(rng):
    b, a, k = 2, 120, 5
    anchors = _random_candidates(rng, b=1, n=a)[0][0]
    deltas = rng.normal(0, 0.3, (b, a, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (b, a, k)).astype(np.float32)
    common = dict(image_size=(256, 256), num_candidates=256,
                  max_detections=40, exact=True)
    lax_det = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        backend="lax", **common)
    pl_det = fused_detect_postprocess(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        backend="pallas", **common)
    np.testing.assert_array_equal(np.asarray(pl_det.labels),
                                  np.asarray(lax_det.labels))
    np.testing.assert_allclose(np.asarray(pl_det.scores),
                               np.asarray(lax_det.scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pl_det.boxes),
                               np.asarray(lax_det.boxes), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pl_det.num_valid),
                                  np.asarray(lax_det.num_valid))


class TestFusedBottleneck:
    """Fused identity-bottleneck kernel (detjax.kernels.bottleneck) vs the
    lax oracle: forward within one bf16 ulp, grads at fp32-accumulation
    noise, and drop-in param-tree equivalence inside ResNet."""

    def _args(self, rng, b=2, h=32, w=16, c=128):
        import jax.numpy as jnp

        m = c // 4
        mk = lambda shape, s: jnp.asarray(rng.normal(0, s, shape), jnp.bfloat16)
        return (
            mk((b, h, w, c), 1.0),
            mk((c, m), 0.1),
            jnp.asarray(rng.normal(0, 0.1, (1, m)), jnp.float32),
            mk((3, 3, m, m), 0.1),
            jnp.asarray(rng.normal(0, 0.1, (1, m)), jnp.float32),
            mk((m, c), 0.1),
            jnp.asarray(rng.normal(0, 0.1, (1, c)), jnp.float32),
        )

    def test_forward_matches_oracle(self, rng):
        from detjax.kernels.bottleneck import (
            bottleneck_identity, bottleneck_identity_reference)

        args = self._args(rng)
        out = np.asarray(bottleneck_identity(*args), np.float32)
        ref = np.asarray(bottleneck_identity_reference(*args), np.float32)
        # identical up to one bf16 ulp (fp32 accumulation-order rounding)
        assert np.abs(out - ref).max() <= 0.05 * max(np.abs(ref).max(), 1.0)
        assert (out != ref).mean() < 0.01

    def test_gradients_match_oracle(self, rng):
        import jax
        import jax.numpy as jnp

        from detjax.kernels.bottleneck import (
            bottleneck_identity, bottleneck_identity_reference)

        args = self._args(rng, b=1, h=16, w=16, c=64)

        def loss(fn, a):
            return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

        gk = jax.grad(lambda a: loss(bottleneck_identity, a))(args)
        gr = jax.grad(lambda a: loss(bottleneck_identity_reference, a))(args)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.abs(b).max(), 1e-3)
            assert np.abs(a - b).max() / scale < 0.02

    def test_resnet_fused_is_dropin(self, rng):
        """fused_blocks=True must accept the SAME variables (identical
        param tree) and produce the same features (bf16 tolerance)."""
        import jax
        import jax.numpy as jnp

        from detjax.models.resnet import ResNet

        x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)), jnp.float32)
        plain = ResNet(stage_sizes=(2,), frozen_bn=True, fused_blocks=False)
        fused = ResNet(stage_sizes=(2,), frozen_bn=True, fused_blocks=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        v2 = fused.init(jax.random.PRNGKey(0), x)
        assert (jax.tree.structure(variables) == jax.tree.structure(v2))
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        f_plain = np.asarray(plain.apply(variables, x)[2], np.float32)
        f_fused = np.asarray(fused.apply(variables, x)[2], np.float32)
        scale = max(np.abs(f_plain).max(), 1.0)
        assert np.abs(f_plain - f_fused).max() / scale < 0.05


class TestMaxPoolBwd:
    """Pallas max-pool backward vs XLA SelectAndScatter: exact equality,
    including first-match tie routing on bf16 inputs (relu zeros tie a lot
    in the real stem)."""

    def test_gradient_matches_selectandscatter(self, rng):
        from detjax.kernels.stem import max_pool_3x3s2, max_pool_3x3s2_reference

        for shape in ((2, 16, 16, 8), (1, 64, 32, 8)):
            z = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
            # relu-like clamping creates exact ties inside windows
            z = jnp.maximum(z, 0.0)
            ct = jnp.asarray(rng.normal(0, 1, max_pool_3x3s2_reference(z).shape),
                             jnp.float32)

            def loss_ref(z):
                return jnp.sum(max_pool_3x3s2_reference(z) * ct)

            def loss_ker(z):
                return jnp.sum(max_pool_3x3s2(z) * ct)

            g_ref = np.asarray(jax.grad(loss_ref)(z))
            g_ker = np.asarray(jax.grad(loss_ker)(z))
            # identical ROUTING (support must match exactly — that is the
            # first-match tie-break under test); values can differ in the
            # last float bit where one position feeds several windows
            # (summation order)
            np.testing.assert_array_equal(g_ker != 0.0, g_ref != 0.0)
            np.testing.assert_allclose(g_ker, g_ref, atol=1e-6, rtol=1e-6)

    def test_bf16_forward_identical(self, rng):
        from detjax.kernels.stem import max_pool_3x3s2, max_pool_3x3s2_reference

        z = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 8)), jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(max_pool_3x3s2(z), np.float32),
            np.asarray(max_pool_3x3s2_reference(z), np.float32))


class TestBatchSPMD:
    """kernels/spmd.py: under pjit with a sharded batch the Pallas custom
    calls must PARTITION over the batch axis (per-shard kernels), not
    replicate — and produce identical values to the unsharded run."""

    def _mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.array(jax.devices()), ("data",))

    def test_matching_kernel_partitions_over_batch(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from detjax.kernels.matching import match_iou_pallas

        mesh = self._mesh()
        a, b, g = 64, 8, 4
        anchors = jnp.asarray(rng.uniform(0, 100, (a, 4)), jnp.float32)
        gt = jnp.asarray(rng.uniform(0, 100, (b, g, 4)), jnp.float32)
        valid = jnp.ones((b, g), bool)
        labels = jnp.ones((b, g), jnp.int32)

        @jax.jit
        def f(gt, valid, labels):
            return match_iou_pallas(anchors, gt, valid, labels, tile=64,
                                    interpret=True)

        ref = f(gt, valid, labels)
        sh = NamedSharding(mesh, P("data"))
        out = f(jax.device_put(gt, sh), jax.device_put(valid, sh),
                jax.device_put(labels, sh))
        # the batch axis survives through the kernel: 8 shards of [1, ...]
        assert len(out[0].addressable_shards) == 8
        assert out[0].addressable_shards[0].data.shape[0] == 1
        for r, o in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(o))

    def test_nms_kernel_partitions_over_batch(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        boxes, scores, labels = _random_candidates(rng, b=8, n=128, k=4)

        @jax.jit
        def f(bx, sc, lb):
            return nms_pallas(bx, sc, lb, iou_threshold=0.5, max_det=32,
                              interpret=True)

        ref = f(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels))
        sh = NamedSharding(mesh, P("data"))
        out = f(jax.device_put(jnp.asarray(boxes), sh),
                jax.device_put(jnp.asarray(scores), sh),
                jax.device_put(jnp.asarray(labels), sh))
        assert len(out[0].addressable_shards) == 8
        for r, o in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(o))

    def test_decode_kernel_partitions_over_batch(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        b, n = 8, 256
        deltas = jnp.asarray(rng.normal(0, 0.3, (b, n, 4)), jnp.float32)
        cxcy = rng.uniform(20, 200, (n, 2))
        wh = rng.uniform(5, 60, (n, 2))
        anchors = jnp.asarray(
            np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1), jnp.float32)

        @jax.jit
        def f(d):
            return decode_boxes_pallas(d, anchors, image_size=(256, 256),
                                       interpret=True)

        ref = f(deltas)
        sh = NamedSharding(mesh, P("data"))
        out = f(jax.device_put(deltas, sh))
        assert len(out.addressable_shards) == 8
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def test_wrapper_memoized_per_signature(self):
        # One custom_partitioning object per (key, batched, signature),
        # alive for the process lifetime. A fresh wrapper per trace lets
        # GC recycle the callback pointer that JAX bakes into the
        # persistent-compile-cache key; a later allocation on the same
        # address then HITS the stale entry and deserializing it
        # segfaults (observed as the full-suite crash at
        # test_train_step::test_empty_gt_batch_finite, round 3).
        from detjax.kernels.spmd import _CP_CACHE, batch_spmd_call

        x = jnp.ones((8, 4), jnp.float32)
        before = dict(_CP_CACHE)

        out1 = batch_spmd_call(lambda v: v * 2, (x,), (True,),
                               key=("memo-test",))
        new = {k: v for k, v in _CP_CACHE.items() if k not in before}
        assert len(new) == 1
        (stored,) = new.values()

        # a DIFFERENT fn object with the same key+signature reuses the
        # stored wrapper (so its callbacks — and their addresses — live on)
        out2 = batch_spmd_call(lambda v: v * 2, (x,), (True,),
                               key=("memo-test",))
        again = {k: v for k, v in _CP_CACHE.items() if k not in before}
        assert len(again) == 1 and next(iter(again.values())) is stored
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

        # a different signature (shape) gets its own wrapper
        batch_spmd_call(lambda v: v * 2, (jnp.ones((4, 4), jnp.float32),),
                        (True,), key=("memo-test",))
        assert len([k for k in _CP_CACHE if k not in before]) == 2
