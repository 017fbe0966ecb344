#!/usr/bin/env python
"""Decompose the detection-loss fwd+bwd cost at the flagship shape
([16, 76725, 80]) on the real chip: matching, focal, smooth-L1, encode.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, args, iters=20, rounds=3):
    import jax

    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])
    best = float("inf")
    for r in range(rounds):
        outs = []
        t0 = time.perf_counter()
        for _ in range(iters):
            outs.append(f(*args))
        np.asarray(jax.tree.leaves(outs[-1])[0].reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / iters
        if r > 0:
            best = min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.modeling import anchor_config
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.losses import detection_loss, focal_loss, smooth_l1_loss
    from detjax.ops.matching import match_anchors

    cfg = get_config("retinanet_r50_640")
    bs, g, k = cfg.train.batch_size, cfg.train.max_gt, cfg.model.num_classes
    anchors = jnp.asarray(anchors_for_shape(cfg.model.image_size,
                                            anchor_config(cfg)))
    a = anchors.shape[0]
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(-2, 1, (bs, a, k)), jnp.bfloat16)
    regs = jnp.asarray(rng.normal(0, 0.2, (bs, a, 4)), jnp.bfloat16)
    gt_boxes = jnp.asarray(
        np.tile(rng.uniform(50, 500, (1, g, 4)).astype(np.float32),
                (bs, 1, 1)))
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 80.0)
    gt_labels = jnp.asarray(
        np.where(np.arange(g) < 8, rng.integers(0, k, (bs, g)), -1)
        .astype(np.int32))

    # full detection loss fwd+bwd wrt (logits, regs)
    def full(lg, rg):
        def f(lg, rg):
            o = detection_loss(lg, rg, anchors, gt_boxes, gt_labels)
            return o.cls_loss + o.reg_loss

        return jax.grad(f, argnums=(0, 1))(lg, rg)

    print(f"detection_loss fwd+bwd: "
          f"{timeit(jax.jit(full), (logits, regs)) * 1e3:7.2f} ms", flush=True)

    # matching alone (fwd only; not differentiated in the real loss)
    mfn = jax.jit(lambda: match_anchors(anchors, gt_boxes, gt_labels,
                                        0.5, 0.4))
    print(f"match_anchors fwd:      {timeit(mfn, ()) * 1e3:7.2f} ms",
          flush=True)

    # focal fwd+bwd on fixed targets
    m = mfn()
    ml, pos, neg = m.matched_labels, m.positive, m.negative

    def focal_fb(lg):
        return jax.grad(
            lambda x: jnp.mean(focal_loss(x, ml, pos, neg)))(lg)

    print(f"focal fwd+bwd:          "
          f"{timeit(jax.jit(focal_fb), (logits,)) * 1e3:7.2f} ms", flush=True)

    # smooth-L1 fwd+bwd
    tgt = jnp.asarray(rng.normal(0, 0.2, (bs, a, 4)), jnp.float32)

    def sl1_fb(rg):
        return jax.grad(
            lambda x: jnp.mean(smooth_l1_loss(x, tgt, pos)))(rg)

    print(f"smooth_l1 fwd+bwd:      "
          f"{timeit(jax.jit(sl1_fb), (regs,)) * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
