#!/usr/bin/env python
"""Per-op device-time attribution of the flagship train step from a REAL
profiler trace — the measurement that settles the roofline's residual rows
(VERDICT r2 weak #4: the 6.1 ms "fusion-boundary" accounting row and the
5-vs-1 ms loss region).

Prefix-differencing (scripts/profile_regions.py) carries ±1-2 ms boundary
error per region because isolated-jit prefixes lose cross-region fusion.
This script instead captures a `jax.profiler.trace` of the production
train step and attributes ACTUAL per-HLO-op self-times from xprof's
hlo_stats converter (per-op source stacks + shapes), grouping ops into
the roofline's regions by source file and, inside the backbone, by
spatial resolution. Output: per-region trace-truth ms/step, the
data-formatting ("glue") share, and the top individual fusions.

Run on the real chip: python scripts/profile_trace.py [--steps 8]
                      [--xplane existing.xplane.pb]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FORMAT_CATEGORIES = {
    "copy", "all-reduce", "reshape", "transpose", "concatenate", "slice",
    "dynamic-slice", "dynamic-update-slice", "bitcast", "pad", "tuple",
    "get-tuple-element", "data formatting", "memory", "host send-recv",
}


def classify(src: str, expr: str, category: str) -> str:
    """Map one HLO op to a roofline region.

    ``src`` is the full inlined source stack, so outer frames (e.g.
    modeling.py, which wraps the whole detect program) must be checked
    AFTER the specific module frames they call into.
    """
    if "ops/losses.py" in src or "ops/matching.py" in src \
            or "kernels/matching.py" in src:
        return "loss"
    if "optax" in src or "clip" in src and "train/step.py" in src:
        return "optimizer"
    if "models/fpn.py" in src or "models/heads.py" in src:
        return "fpn+heads"
    if "ops/boxes.py" in src:
        return "encode/decode"
    if "ops/nms.py" in src or "kernels/nms" in src \
            or "kernels/postprocess.py" in src or "ops/detect" in src:
        return "postprocess"
    if "detjax/quant.py" in src:
        # int8 engine traversal: bucket by output spatial size (head
        # towers share 80²..5² with backbone stages — read the top-op
        # exprs for the fine split)
        for dim, region in ((",320,320,", "int8@320"), (",160,160,", "int8@160"),
                            (",80,80,", "int8@80"), (",40,40,", "int8@40"),
                            (",20,20,", "int8@20"), (",10,10,", "int8@10"),
                            (",5,5,", "int8@5")):
            if dim in expr:
                return region
        return "int8-other"
    if "models/resnet.py" in src or "flax" in src and "pool" in expr:
        # split the backbone by spatial resolution in the op text:
        # stem ops run at 320², layer1 at 160², layer2 80², layer3 40²,
        # layer4 20² (640px input)
        for dim, region in ((",320,320,", "stem"), (",160,160,", "layer1"),
                            (",80,80,", "layer2"), (",40,40,", "layer3"),
                            (",20,20,", "layer4")):
            if dim in expr:
                return region
        if "select_and_scatter" in expr or "reduce-window" in expr:
            return "stem"
        return "backbone-other"
    if "train/step.py" in src:
        return "optimizer"
    return "other"


def capture_trace(steps: int, mode: str = "train",
                  infer_bs: int = 8) -> str:
    import jax
    import jax.numpy as jnp

    from detjax.config import get_config
    from detjax.train.step import make_train_state, make_train_step

    np.asarray(jnp.zeros(8))  # absorb cold-tunnel D2H stall

    cfg = get_config("retinanet_r50_640")
    bs, (h, w) = cfg.train.batch_size, cfg.model.image_size
    g = cfg.train.max_gt
    rng = np.random.default_rng(0)

    if mode in ("infer", "infer-int8"):
        from detjax.modeling import _detect_fn, build_model

        _, variables = build_model(cfg)
        # production parity: the serving/eval normalize fusion emits the
        # MODEL dtype (pipeline.device_augment out_dtype), so the detect
        # jit never sees an fp32 batch or its standalone astype copy
        images = jnp.asarray(rng.normal(0, 1, (infer_bs, h, w, 3)),
                             cfg.model.dtype)
        if mode == "infer-int8":
            from detjax.quant import _detect_int8_fn, quantize_model

            qtree = quantize_model(variables, cfg, images)
            int8_fn = _detect_int8_fn(cfg)
            dfn = lambda v, im: int8_fn(qtree, im)  # noqa: E731
        else:
            dfn = _detect_fn(cfg)
        np.asarray(dfn(variables, images).scores)  # compile
        outs = [dfn(variables, images).scores for _ in range(4)]  # warm
        np.asarray(outs[-1])
        tdir = tempfile.mkdtemp(prefix="detjax_trace_")
        with jax.profiler.trace(tdir):
            outs = [dfn(variables, images).scores for _ in range(steps)]
            np.asarray(jnp.stack([o[0, 0] for o in outs]).sum())
    else:
        batch = {
            "images": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)),
                                  jnp.float32),
            "gt_boxes": jnp.tile(
                jnp.asarray([[[50.0, 50, 300, 300]]], jnp.float32),
                (bs, g, 1)),
            "gt_labels": jnp.concatenate(
                [jnp.full((bs, 2), 3, jnp.int32),
                 -jnp.ones((bs, g - 2), jnp.int32)], axis=1),
        }
        state = make_train_state(cfg)
        step = make_train_step(cfg)
        s, m = step(state, batch)           # compile
        np.asarray(m["loss"])
        for _ in range(3):                  # warm
            s, m = step(s, batch)
        np.asarray(m["loss"])
        tdir = tempfile.mkdtemp(prefix="detjax_trace_")
        with jax.profiler.trace(tdir):
            for _ in range(steps):
                s, m = step(s, batch)
            np.asarray(m["loss"])
    paths = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {tdir}"
    return paths[0]


def hlo_rows(xplane_path: str):
    """hlo_stats rows via xprof: list of dicts with the columns we use."""
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in tbl["cols"]]
    out = []
    for row in tbl["rows"]:
        vals = [c.get("v") if isinstance(c, dict) else None for c in row["c"]]
        out.append(dict(zip(cols, vals)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--xplane", default=None,
                    help="parse an existing xplane.pb instead of tracing")
    ap.add_argument("--mode", default="train",
                    choices=("train", "infer", "infer-int8"),
                    help="trace the train step or the fused detect path")
    ap.add_argument("--infer-bs", type=int, default=8)
    args = ap.parse_args()

    path = args.xplane or capture_trace(args.steps, args.mode,
                                        args.infer_bs)
    print(f"xplane: {path}", flush=True)
    rows = hlo_rows(path)
    steps = args.steps

    per_region = collections.Counter()
    per_region_fmt = collections.Counter()  # formatting-category share
    examples = collections.defaultdict(list)
    total_us = 0.0
    for row in rows:
        us = float(row["total_self_time"] or 0.0)
        if us <= 0:
            continue
        total_us += us
        raw_src = str(row.get("source_info") or "")
        # full inlined stack lives in the cell's title='...' attribute
        m = re.search(r"title='([^']*)'", raw_src)
        src = m.group(1) if m else re.sub(r"<[^>]*>", "", raw_src)
        expr = str(row.get("hlo_op_expression") or "")
        cat = str(row.get("category") or "").lower()
        region = classify(src, expr, cat)
        per_region[region] += us
        if cat in FORMAT_CATEGORIES:
            per_region_fmt[region] += us
        examples[region].append(
            (us, cat, str(row.get("hlo_op_name")), src.split("\n")[0][:60]))

    print(f"\nbusy device time (sum of HLO self-times): "
          f"{total_us / 1e3 / steps:.2f} ms/step over {steps} steps")
    print("\nper-region trace truth (ms/step; 'fmt' = copy/reshape/"
          "transpose/concat/slice categories inside the region):")
    for region, us in per_region.most_common():
        print(f"  {region:14s} {us / 1e3 / steps:7.2f}   "
              f"fmt {per_region_fmt[region] / 1e3 / steps:5.2f}")

    print(f"\ntop {args.top} ops by self time (ms/step):")
    flat = [(us, cat, name, region, src60)
            for region, exs in examples.items()
            for us, cat, name, src60 in exs]
    for us, cat, name, region, src60 in sorted(flat, reverse=True)[:args.top]:
        print(f"  {us / 1e3 / steps:7.3f}  {region:11s} {cat:18s} "
              f"{name:24s} {src60}")


if __name__ == "__main__":
    main()
