#!/usr/bin/env python
"""A/B: logit-domain candidate selection vs sigmoid-then-select.

Times the fused R50-640 detect path at bs=8/1 with (a) the production
logit-domain selection (modeling._detect_fn) and (b) the round-2 behavior
(full [B, A, K] sigmoid materialized before selection), plus a detection
equality check. Run on the TPU (default python).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(1))  # pre-warm device readback (first-xfer stall)

    from detjax.config import get_config
    from detjax.modeling import _detect_fn, anchor_config, build_model
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.nms import fused_detect_postprocess

    cfg = get_config("retinanet_r50_640")
    e = cfg.eval
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    anchors_np = anchors_for_shape(cfg.model.image_size, anchor_config(cfg))

    # De-saturate the class logits: a raw random-init tower emits |logit|
    # up to ~140 (std 28), where fp32 sigmoid collapses 1.3M pairs to
    # exactly 1.0 and the probability-domain path degenerates to an
    # index-ordered tie slice (see ops/nms._select_candidates docstring).
    # Scaling the final cls kernel by 0.05 puts logits in the trained
    # regime (std ~1.4, max ~+2.5) where both paths must agree exactly.
    variables = jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf * 0.05
        if any(getattr(p, "key", None) == "cls_out" for p in path)
        and getattr(path[-1], "key", None) == "kernel" else leaf,
        variables)

    @jax.jit
    def detect_sigmoid_first(variables, images):
        anchors = jnp.asarray(anchors_np)
        cls_logits, box_deltas = module.apply(variables, images, train=False)
        box_deltas = box_deltas.astype(jnp.float32)
        scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        return fused_detect_postprocess(
            box_deltas, anchors, scores,
            box_std=cfg.model.box_std, image_size=cfg.model.image_size,
            score_threshold=e.score_threshold,
            iou_threshold=e.nms_iou_threshold,
            num_candidates=e.pre_nms_top_k,
            max_detections=e.max_detections, exact=e.exact_candidates)

    detect_logit = _detect_fn(cfg)

    rng = np.random.default_rng(0)
    h, w = cfg.model.image_size

    for bs in (8, 1):
        images = jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32)

        ref = detect_sigmoid_first(variables, images)
        out = detect_logit(variables, images)
        nv_r, nv_o = np.asarray(ref.num_valid), np.asarray(out.num_valid)
        assert (nv_r == nv_o).all(), (nv_r, nv_o)
        for i in range(bs):
            nv = int(nv_r[i])
            np.testing.assert_array_equal(np.asarray(ref.labels[i, :nv]),
                                          np.asarray(out.labels[i, :nv]))
            np.testing.assert_allclose(np.asarray(ref.scores[i, :nv]),
                                       np.asarray(out.scores[i, :nv]),
                                       atol=1e-6)
        print(f"bs={bs}: detections identical "
              f"(num_valid {nv_r.tolist()})", flush=True)

        def timed(fn, iters=50):
            def _round(n):
                outs = []
                t0 = time.perf_counter()
                for _ in range(n):
                    outs.append(fn(variables, images).scores)
                float(np.asarray(jnp.stack([o[0, 0] for o in outs]).sum()))
                return (time.perf_counter() - t0) / n
            _round(10)
            return min(_round(iters), _round(iters))

        t_sig = timed(detect_sigmoid_first)
        t_log = timed(detect_logit)
        print(f"bs={bs}: sigmoid-first {t_sig * 1e3:7.2f} ms/batch "
              f"({bs / t_sig:6.1f} img/s) | logit-domain "
              f"{t_log * 1e3:7.2f} ms/batch ({bs / t_log:6.1f} img/s) | "
              f"delta {(t_sig - t_log) * 1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
