#!/usr/bin/env python
"""XLA compiler-option sweep for the flagship train step (ROADMAP item 1).

Round-1's first sweep was invalidated by donated buffers leaking across
measurements; this harness rebuilds state per option. Add candidate option
dicts to CANDIDATES and run on the TPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CANDIDATES = [
    ("baseline", None),
    # scoped-vmem: more VMEM per fusion lets Mosaic/XLA build deeper
    # conv+elementwise fusions (v5e has 128 MiB VMEM; default scope ~16 MiB)
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # fusion cost-model variants
    ("bundle_cost_model", {
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
    ("aggr_loop_fusion_layout", {
        "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("licm_inflate_8", {"xla_tpu_licm_size_inflation_ratio": "8"}),
    ("no_dot_strength_red", {
        "xla_tpu_enable_dot_strength_reduction": "false"}),
    # scheduler
    ("no_latency_hiding_sched", {
        "xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("flash_vmem+sched", {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"}),
]


def main():
    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.train.step import make_train_state, make_optimizer
    from detjax.models.detector import build_detector
    from detjax.modeling import anchor_config
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.losses import detection_loss

    cfg = get_config("retinanet_r50_640")
    module = build_detector(cfg.model)
    bs, (h, w), g = cfg.train.batch_size, cfg.model.image_size, cfg.train.max_gt
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32)
    gt_boxes = jnp.zeros((bs, g, 4), jnp.float32)
    gt_labels = -jnp.ones((bs, g), jnp.int32)
    anchors = jnp.asarray(anchors_for_shape(cfg.model.image_size,
                                            anchor_config(cfg)))
    base_state = make_train_state(cfg, jax.random.PRNGKey(0))
    tx = base_state.tx

    def step(params, batch_stats, opt_state, x):
        def loss_fn(p):
            c, b = module.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True)
            o = detection_loss(c, b, anchors, gt_boxes, gt_labels)
            return o.cls_loss + o.reg_loss

        import optax

        grads = jax.grad(loss_fn)(params)
        up, os2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, up), os2

    for name, opts in CANDIDATES:
        # fresh (undonated) state per candidate
        params = jax.tree.map(jnp.array, base_state.params)
        opt_state = tx.init(params)
        try:
            f = jax.jit(step, donate_argnums=(0, 2),
                        compiler_options=opts or None)
            p, o = f(params, base_state.batch_stats, opt_state, images)
            np.asarray(jax.tree.leaves(p)[0]).ravel()[:1]
            for _ in range(6):
                p, o = f(p, base_state.batch_stats, o, images)
            np.asarray(jax.tree.leaves(p)[0]).ravel()[:1]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(15):
                    p, o = f(p, base_state.batch_stats, o, images)
                np.asarray(jax.tree.leaves(p)[0]).ravel()[:1]
                best = min(best, (time.perf_counter() - t0) / 15)
            print(f"{name:24s} {best * 1e3:7.2f} ms  {bs / best:6.1f} img/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{name:24s} FAIL: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
