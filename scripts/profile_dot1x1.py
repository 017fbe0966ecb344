#!/usr/bin/env python
"""A/B the dot-form 1×1 conv lowering (ModelConfig.dot_1x1) in the REAL
train step — the decisive in-graph test for the conv-backward campaign
(VERDICT r2 next-round #1).

Isolated chain timings (scripts/profile_conv_bwd.py, v5e, bs16/640):
conv-form dW at the bottleneck 1×1 shapes runs 5–30× off roofline while
the equivalent dot-form contraction sits near it (l1.conv3 dx+dw 3.9 ms
vs dot-dx+dot-dw 1.5 ms). Round 2 showed isolated wins can vanish
in-graph (cross-block fusion), so the verdict comes from the production
step: same timing protocol as scripts/profile_optimizer.py
(donation-safe state chaining, throwaway round, min of rounds).

Also checks numerics: fwd outputs of the two lowerings on identical
params/inputs (bf16 drift only), and prints eval-path (detect) A/B.

Run on the real chip: python scripts/profile_dot1x1.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_step(cfg, batch, rounds=3, iters=12):
    import jax

    from detjax.train.step import make_train_state, make_train_step

    state = make_train_state(cfg)
    step = make_train_step(cfg)
    s, m = step(state, batch)
    np.asarray(m["loss"])
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step(s, batch)
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        if r > 0:
            best = min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.modeling import build_model, detect

    np.asarray(jnp.zeros(8))  # absorb cold-tunnel D2H stall

    base = get_config("retinanet_r50_640")
    bs, (h, w) = base.train.batch_size, base.model.image_size
    g = base.train.max_gt
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32),
        "gt_boxes": jnp.tile(
            jnp.asarray([[[50.0, 50, 300, 300]]], jnp.float32), (bs, g, 1)),
        "gt_labels": jnp.concatenate(
            [jnp.full((bs, 2), 3, jnp.int32),
             -jnp.ones((bs, g - 2), jnp.int32)], axis=1),
    }

    # numerics first: identical params through the lowerings (fwd/detect)
    cfg_off = get_config("retinanet_r50_640", **{"model.dot_1x1": "off"})
    cfg_on = get_config("retinanet_r50_640", **{"model.dot_1x1": "on"})
    cfg_dw = get_config("retinanet_r50_640", **{"model.dot_1x1": "dw"})
    _, variables = build_model(cfg_off)
    x1 = batch["images"][:2]
    d_off = detect(variables, x1, cfg_off)
    for name, c in (("full", cfg_on), ("dw", cfg_dw)):
        d_alt = detect(variables, x1, c)
        s_off = np.sort(np.asarray(d_off.scores).ravel())
        s_alt = np.sort(np.asarray(d_alt.scores).ravel())
        drift = float(np.max(np.abs(s_off - s_alt)))
        print(f"detect score drift vs conv-form ({name}): {drift:.2e}",
              flush=True)
        assert drift < 1e-2, (name, drift)  # bf16 cross-lowering tolerance

    # dw-mode gradient exactness: custom-VJP dW vs autodiff conv dW, fp32
    from detjax.models.resnet import conv1x1_dotdw, _conv1x1
    xs = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 8)), jnp.float32)
    ks = jnp.asarray(rng.normal(0, 0.1, (1, 1, 8, 12)), jnp.float32)
    ct = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 12)), jnp.float32)
    f_ref = lambda x, k: jnp.vdot(_conv1x1(x, k), ct)
    f_dw = lambda x, k: jnp.vdot(conv1x1_dotdw(x, k), ct)
    gx_r, gk_r = jax.grad(f_ref, (0, 1))(xs, ks)
    gx_d, gk_d = jax.grad(f_dw, (0, 1))(xs, ks)
    print(f"dw-mode grad diff: dX {float(jnp.max(jnp.abs(gx_r - gx_d))):.2e} "
          f"dW {float(jnp.max(jnp.abs(gk_r - gk_d))):.2e}", flush=True)
    assert float(jnp.max(jnp.abs(gx_r - gx_d))) < 1e-3
    assert float(jnp.max(jnp.abs(gk_r - gk_d))) < 1e-2

    for label, cfg in (("conv-form (off)", cfg_off),
                       ("dot-dw", cfg_dw),
                       ("conv-form again", cfg_off),
                       ("dot-full (on)", cfg_on)):
        dt = time_step(cfg, batch)
        print(f"train step {label:18s}: {dt * 1e3:7.2f} ms "
              f"({bs / dt:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
