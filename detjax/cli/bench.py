"""``detjax-bench``: package entry point for the repo-root benchmark
(prints the one-line JSON throughput record; see /bench.py)."""

from __future__ import annotations

import json
import time


def main():
    # import the repo-root bench when present (dev checkout), else inline.
    # Only the import is guarded: an ImportError raised INSIDE the root
    # bench must propagate, not silently fall through to the inline path.
    try:
        import bench as _root_bench  # type: ignore
    except ImportError:
        _root_bench = None
    if _root_bench is not None:
        _root_bench.main()
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from detjax.config import get_config
    from detjax.train.step import make_train_state, make_train_step

    cfg = get_config("retinanet_r50_640")
    bs = cfg.train.batch_size
    h, w = cfg.model.image_size
    rng = np.random.default_rng(0)
    g = cfg.train.max_gt
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32),
        "gt_boxes": jnp.zeros((bs, g, 4), jnp.float32),
        "gt_labels": -jnp.ones((bs, g), jnp.int32),
    }
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    s, m = step(state, batch)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(20):
        s, m = step(s, batch)
    float(np.asarray(m["loss"]))
    img_s = bs * 20 / (time.perf_counter() - t0)
    print(json.dumps({"metric": "train images/sec/chip RetinaNet-R50 640",
                      "value": round(img_s, 2), "unit": "images/sec/chip"}))


if __name__ == "__main__":
    main()
