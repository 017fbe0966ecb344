#!/usr/bin/env python
"""Per-region fwd+bwd timing of the R50-640 train step on the real chip.

Strategy: time fwd+bwd of depth-truncated models (stem, stem+layer1, ...)
and difference the prefixes — this avoids relying on trace tooling over the
axon tunnel and attributes time to the stages as XLA actually compiles them
(fusions can't cross a jit boundary, so absolute numbers are slight
overestimates; differences are reliable).

Timing protocol (memory: axon tunnel): handle-only loops, one throwaway
round after compile, min of rounds, force with np.asarray.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, args, iters=12, rounds=3):
    out = f(*args)
    np.asarray(jax_tree_first(out))
    best = float("inf")
    for r in range(rounds):
        outs = []
        t0 = time.perf_counter()
        for _ in range(iters):
            outs.append(f(*args))
        np.asarray(jax_tree_first(outs[-1]))
        dt = (time.perf_counter() - t0) / iters
        if r > 0:  # round 0 is the settle round
            best = min(best, dt)
    return best


def jax_tree_first(tree):
    import jax

    leaf = jax.tree.leaves(tree)[0]
    return leaf.reshape(-1)[:1]


def main():
    import jax
    import jax.numpy as jnp
    from flax import core

    from detjax.config import get_config
    from detjax.models.resnet import ResNet
    from detjax.models.fpn import FPN
    from detjax.models.detector import build_detector
    from detjax.modeling import anchor_config
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.losses import detection_loss

    cfg = get_config("retinanet_r50_640")
    bs, (h, w) = cfg.train.batch_size, cfg.model.image_size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    results = {}

    # ---- truncated-backbone prefixes ----
    from functools import partial
    from flax import linen as nn
    from detjax.models.resnet import Conv

    class StemOnly(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            norm = partial(nn.BatchNorm, use_running_average=True,
                           momentum=0.9, epsilon=1e-5, dtype=jnp.bfloat16)
            x = x.astype(jnp.bfloat16)
            x = Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                     dtype=jnp.bfloat16, name="conv1")(x)
            x = nn.relu(norm(name="bn1")(x))
            return {0: nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))}

    full_sizes = (3, 4, 6, 3)
    prefixes = [("stem", None), ("+layer1", (3,)), ("+layer2", (3, 4)),
                ("+layer3", (3, 4, 6)), ("+layer4", full_sizes)]
    prev = 0.0
    for name, sizes in prefixes:
        net = (StemOnly() if sizes is None
               else ResNet(stage_sizes=sizes, frozen_bn=True))
        vs = net.init(key, jnp.zeros((1, h, w, 3), jnp.float32), train=True)
        params, stats = vs["params"], vs.get("batch_stats", core.FrozenDict())

        def fb(params, x, _net=net, _stats=stats):
            def loss(p):
                f = _net.apply({"params": p, "batch_stats": _stats}, x,
                               train=True)
                feats = f if isinstance(f, jnp.ndarray) else list(f.values())
                if not isinstance(feats, list):
                    feats = [feats]
                return sum(jnp.sum(v.astype(jnp.float32)) for v in feats)

            return jax.grad(loss)(params)

        t = timeit(jax.jit(fb), (params, x))
        results[name] = (t, t - prev)
        print(f"{name:10s} cumulative {t * 1e3:7.2f} ms   "
              f"stage Δ {(t - prev) * 1e3:7.2f} ms", flush=True)
        prev = t

    # ---- full detector fwd+bwd, loss included vs excluded ----
    module = build_detector(cfg.model)
    vs = module.init(key, jnp.zeros((1, h, w, 3), jnp.float32), train=True)
    params, stats = vs["params"], vs.get("batch_stats", core.FrozenDict())
    anchors = jnp.asarray(anchors_for_shape(cfg.model.image_size,
                                            anchor_config(cfg)))
    g = cfg.train.max_gt
    gt_boxes = jnp.tile(jnp.asarray([[[50, 50, 300, 300]]], jnp.float32),
                        (bs, g, 1))
    gt_labels = jnp.concatenate(
        [jnp.full((bs, 2), 3, jnp.int32), -jnp.ones((bs, g - 2), jnp.int32)],
        axis=1)

    def heads_fb(params, x):
        def loss(p):
            cls, box = module.apply({"params": p, "batch_stats": stats}, x,
                                    train=True)
            return (jnp.sum(cls.astype(jnp.float32))
                    + jnp.sum(box.astype(jnp.float32)))

        return jax.grad(loss)(params)

    t_model = timeit(jax.jit(heads_fb), (params, x))
    results["model(no loss)"] = (t_model, t_model - prev)
    print(f"model fwd+bwd (sum-loss): {t_model * 1e3:7.2f} ms", flush=True)

    def full_fb(params, x):
        def loss(p):
            cls, box = module.apply({"params": p, "batch_stats": stats}, x,
                                    train=True)
            o = detection_loss(cls, box, anchors, gt_boxes, gt_labels)
            return o.cls_loss + o.reg_loss

        return jax.grad(loss)(params)

    t_full = timeit(jax.jit(full_fb), (params, x))
    results["model+loss"] = (t_full, t_full - t_model)
    print(f"model fwd+bwd (+det loss): {t_full * 1e3:7.2f} ms", flush=True)

    # ---- report ----
    print("\n=== per-region (differenced) ===")
    prev = 0.0
    for name, (cum, delta) in results.items():
        print(f"{name:16s} cum {cum * 1e3:7.2f} ms   Δ {delta * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
