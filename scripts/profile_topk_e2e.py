#!/usr/bin/env python
"""A/B: PartialReduce candidate top-k vs full-sort top-k, full detect path.

Times the fused R50-640 detect step at bs=8/1 with eval.topk_mode
"partial" (production TPU default) vs "exact", and compares detections
(tie-aware: de-saturated trained-regime logits, sorted score multisets).
Run on the TPU (default python). See scripts/profile_topk.py for the
isolated-op measurements and docs/ROOFLINE.md for the trace context.
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

    np.asarray(jnp.zeros(1))  # pre-warm device readback

    from detjax.config import get_config
    from detjax.modeling import _detect_fn, build_model

    def desaturate(variables):
        # trained-regime logits (see scripts/profile_logit_select.py)
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: leaf * 0.05
            if any(getattr(p, "key", None) == "cls_out" for p in path)
            and getattr(path[-1], "key", None) == "kernel" else leaf,
            variables)

    cfg_part = get_config("retinanet_r50_640", **{"eval.topk_mode": "partial"})
    cfg_exact = get_config("retinanet_r50_640", **{"eval.topk_mode": "exact"})
    _, variables = build_model(cfg_part, jax.random.PRNGKey(0))
    variables = desaturate(variables)
    det_part = _detect_fn(cfg_part)
    det_exact = _detect_fn(cfg_exact)

    rng = np.random.default_rng(0)
    h, w = cfg_part.model.image_size

    for bs in (8, 1):
        images = jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32)
        ref = det_exact(variables, images)
        out = det_part(variables, images)
        nv_r, nv_o = np.asarray(ref.num_valid), np.asarray(out.num_valid)
        assert (nv_r == nv_o).all(), (nv_r, nv_o)
        tie_swaps = 0
        for i in range(bs):
            nv = int(nv_r[i])
            sr = np.sort(np.asarray(ref.scores[i, :nv]))
            so = np.sort(np.asarray(out.scores[i, :nv]))
            np.testing.assert_allclose(so, sr, atol=1e-6)
            tie_swaps += int(
                (np.asarray(ref.labels[i, :nv])
                 != np.asarray(out.labels[i, :nv])).sum())
        print(f"bs={bs}: num_valid identical {nv_r.tolist()}, score "
              f"multisets equal, {tie_swaps} tie-block label swaps",
              flush=True)

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

        t_ex = timed(det_exact)
        t_pa = timed(det_part)
        print(f"bs={bs}: exact-sort {t_ex * 1e3:7.2f} ms/batch "
              f"({bs / t_ex:6.1f} img/s) | partial "
              f"{t_pa * 1e3:7.2f} ms/batch ({bs / t_pa:6.1f} img/s) | "
              f"delta {(t_ex - t_pa) * 1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
