#!/usr/bin/env python
"""Serving-export CLI: checkpoint → self-contained StableHLO detect artifact.

The reference's deployment story is ``torch.save(model, ...)`` + matching
model code on the serving host (SURVEY.md §5.4). This emits the TPU-native
equivalent: one file containing the compiled fused detect graph with the
trained weights baked in (see detjax/export.py). Verify with --selftest,
which reloads the artifact and diffs it against the live detect path.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output artifact path (e.g. detect.stablehlo)")
    ap.add_argument("--preset", default="retinanet_r50_640")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering platforms (default: "
                         "current backend), e.g. 'tpu,cpu'")
    ap.add_argument("--selftest", action="store_true",
                    help="reload the artifact and diff vs live detect()")
    ap.add_argument("--set", action="append", dest="overrides",
                    metavar="group.field=value")
    args = ap.parse_args()

    import ast
    import os

    import jax
    import numpy as np

    from detjax.config import get_config
    from detjax.export import load_detect, save_detect
    from detjax.train import make_train_state
    from detjax.train.checkpoint import Checkpointer

    overrides = {}
    for p in args.overrides or []:
        key, _, val = p.partition("=")
        try:
            overrides[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            overrides[key] = val
    cfg = get_config(args.preset, **overrides)
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    state = Checkpointer(args.ckpt_dir).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    platforms = tuple(p for p in args.platforms.split(",") if p) or None
    save_detect(args.out, variables, cfg, batch_size=args.batch_size,
                platforms=platforms)
    print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"batch={args.batch_size}, image={cfg.model.image_size})")

    if args.selftest:
        from detjax.modeling import detect

        h, w = cfg.model.image_size
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (args.batch_size, h, w, 3))
        served = load_detect(args.out)(images)
        live = detect(variables, images, cfg)
        # The artifact is lowered separately from the live jit, so bf16
        # conv drift (~1e-2 in scores) can swap the RANK of near-tied
        # detections — compare the score distribution, not positions.
        s_srv = np.sort(np.asarray(served.scores), axis=-1)
        s_live = np.sort(np.asarray(live.scores), axis=-1)
        ok = (np.array_equal(np.asarray(served.num_valid),
                             np.asarray(live.num_valid))
              and np.allclose(s_srv, s_live, atol=2e-2))
        print(f"selftest: num_valid match + score distribution within "
              f"bf16 drift → {'OK' if ok else 'MISMATCH'} "
              f"(max score delta {np.abs(s_srv - s_live).max():.2e})")
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
