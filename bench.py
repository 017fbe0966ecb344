"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): images/sec/chip at RetinaNet-R50 640px.
We measure the training step (config 3: bs=16, anchor matching + focal +
smooth-L1, full backward + adam) on the real chip; inference (config 1
path: fused decode+NMS, bs=8) is measured too and folded into the same
line's detail fields.

``vs_baseline``: no published reference numbers exist (BASELINE.md —
reference mount empty, ``published: {}``). The north star is ≥4× A100-
PyTorch images/sec/chip; we use a documented ASSUMED A100 baseline of
75 train-img/s (lineage RetinaNet-R50 @640, AMP, bs16 — see BASELINE.md),
so vs_baseline = value / (4 × 75): ≥1.0 means the north-star target is met.

The metric as WRITTEN (BASELINE.json) is "images/sec/chip … (train +
infer)", so the line also reports the north-star COMPOSITE: the geometric
mean of the train and infer attainment ratios, each against its own
assumed 4×A100 bar. The infer-side A100 assumption is 110 img/s — a
deliberately GENEROUS ceiling for the reference's eval branch, whose
per-class Python NMS loop + per-image CPU sync (SURVEY.md §3.2) holds the
real lineage well below that. Derivation + sensitivity: BASELINE.md
"North-star composite".
"""

from __future__ import annotations

import json
import sys
import time

ASSUMED_A100_TRAIN_IMG_S = 75.0
ASSUMED_A100_INFER_IMG_S = 110.0
NORTH_STAR_MULT = 4.0


def _force(x) -> float:
    """Host-fetch a scalar: the only reliable sync under the axon tunnel
    (block_until_ready returns before remote execution completes there)."""
    import numpy as np

    return float(np.asarray(x).reshape(-1)[0])


def _backend_watchdog(timeout_s: float = 900.0):
    """Fail FAST if the TPU backend can't initialize (the axon tunnel has
    been observed UNAVAILABLE for hours): backend init hangs in C land, so
    a worker thread probes jax.devices() while the main thread waits — on
    timeout we print a diagnostic and hard-exit instead of wedging the
    driver's bench run indefinitely."""
    import os
    import threading

    done = threading.Event()
    err = []

    def probe():
        try:
            import jax

            jax.devices()
        except Exception as e:  # immediate init failure: report it, fast
            err.append(repr(e))
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s) or err:
        print(json.dumps({
            "error": err[0] if err else
            f"TPU backend failed to initialize within {timeout_s:.0f}s "
            f"(axon tunnel down?)"}), file=sys.stderr, flush=True)
        os._exit(1)


def main():
    _backend_watchdog()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detjax.config import get_config
    from detjax.modeling import _detect_fn
    from detjax.train.step import make_train_state, make_train_step

    # ---- train throughput: config 3 (R50 @640, bs=16) ----
    cfg = get_config("retinanet_r50_640")
    bs = cfg.train.batch_size
    h, w = cfg.model.image_size
    rng = np.random.default_rng(0)
    g = cfg.train.max_gt
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, h, w, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(
            np.concatenate([
                np.tile(np.array([[[50, 50, 300, 300], [200, 200, 500, 500]]],
                                 np.float32), (bs, 1, 1)),
                np.zeros((bs, g - 2, 4), np.float32)], axis=1)),
        "gt_labels": jnp.asarray(
            np.concatenate([
                np.tile(np.array([[3, 7]], np.int32), (bs, 1)),
                -np.ones((bs, g - 2), np.int32)], axis=1)),
    }
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)

    def train_once(state_and_m):
        s, _ = state_and_m
        return step(s, batch)

    # warmup/compile, then timed loop; steps chain through the donated
    # state, so ONE host fetch at the end forces the whole sequence.
    # Several forced warmup steps: the axon tunnel ramps over the first few
    # dispatches of a process and would understate steady-state throughput.
    s, m = step(state, batch)
    _force(m["loss"])
    for _ in range(9):  # settle round (see infer note below)
        s, m = step(s, batch)
    _force(m["loss"])
    iters = 20
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            s, m = step(s, batch)
        _force(m["loss"])
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    train_img_s = bs / best_dt

    # ---- inference throughput: fused detect @640, bs=8 ----
    # images arrive in the MODEL dtype, as the serving/eval normalize
    # fusion emits it (pipeline.device_augment out_dtype) — the detect
    # jit never sees an fp32 batch in production
    infer_bs = 8
    images = jnp.asarray(rng.normal(0, 1, (infer_bs, h, w, 3)),
                         cfg.model.dtype)
    variables = {"params": s.params, "batch_stats": s.batch_stats}
    dfn = _detect_fn(cfg)
    # Measurement protocol for the axon tunnel:
    #  * keep raw output handles during the timed loop — executions queue
    #    back-to-back on the device (true throughput); any per-call
    #    dependent op serializes a host round-trip and measures latency
    #  * one throwaway pipelined round after compile — the first round
    #    after a fresh executable runs ~10× slow (residual async
    #    compile/cache work), then settles permanently
    def _round(iters):
        outs = []
        t0 = time.perf_counter()
        for _ in range(iters):
            outs.append(dfn(variables, images).scores)
        _force(jnp.stack([o[0, 0] for o in outs]).sum())  # forces every call
        return (time.perf_counter() - t0) / iters

    _round(10)  # compile + settle
    dt = min(_round(20), _round(20))
    infer_img_s = infer_bs / dt

    # ---- int8 PTQ serving path (detjax/quant.py) ----
    int8_detail = ""
    try:
        from detjax import quant

        qtree = quant.quantize_model(variables, cfg, images)

        def _round_i8(iters):
            outs = []
            t0 = time.perf_counter()
            for _ in range(iters):
                outs.append(quant.detect_int8(qtree, images, cfg).scores)
            _force(jnp.stack([o[0, 0] for o in outs]).sum())
            return (time.perf_counter() - t0) / iters

        _round_i8(10)
        dt8 = min(_round_i8(20), _round_i8(20))
        int8_detail = f", int8 = {infer_bs / dt8:.1f}"
    except Exception as e:
        # never break the headline line, but a broken int8 path must be
        # visible, not indistinguishable from "not measured"
        print(f"[bench] int8 path failed: {e!r}", file=sys.stderr)

    n_chips = 1  # single-chip benchmark box
    value = train_img_s / n_chips
    # North-star composite, per the metric as written ("train + infer"):
    # geomean of per-phase attainment vs each phase's assumed 4×A100 bar
    # (infer bar 110 img/s is deliberately generous to the reference —
    # BASELINE.md "North-star composite" derives + stress-tests both).
    train_ratio = value / (ASSUMED_A100_TRAIN_IMG_S * NORTH_STAR_MULT)
    infer_ratio = (infer_img_s / n_chips) / (
        ASSUMED_A100_INFER_IMG_S * NORTH_STAR_MULT)
    composite = (train_ratio * infer_ratio) ** 0.5
    result = {
        "metric": "train images/sec/chip, RetinaNet-R50 640px (bs=16, "
                  "matching+focal+smoothL1+adam); infer images/sec/chip "
                  f"(bs=8, fused decode+NMS) = {infer_img_s:.1f}"
                  f"{int8_detail}; north-star composite geomean("
                  f"train/{ASSUMED_A100_TRAIN_IMG_S * NORTH_STAR_MULT:.0f}, "
                  f"infer/{ASSUMED_A100_INFER_IMG_S * NORTH_STAR_MULT:.0f}) "
                  f"= {composite:.3f} (infer alone {infer_ratio:.3f})",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(train_ratio, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
