"""E2E accuracy gates: overfit synthetic scenes, then mAP via the full
fused detect + COCOeval stack (SURVEY.md §4.6).

Gates (run on the real chip; --gate quick|hard|ssd|all):
  quick — 6 classes @256px, 8 images: boxes lock on, AP50 ≈ 1. Round-1 gate.
  hard  — 80 classes @640px, 16 images with COCO-"small" objects, crowd
          ignore-regions and random-crop augmentation; ALSO asserts the
          production two-stage candidate selection produces the SAME
          detections as the exact global top-k on the TRAINED model
          (VERDICT round-1 weak #2), at the flagship resolution.
  ssd   — the ssd_512 preset actually TRAINS (VERDICT round-1 weak #3):
          overfit @512px with SSD per-level anchors, assert AP50.
  int8  — PTQ engine AP matches the fp path on the trained model.
  export— the StableHLO serving artifact's AP matches the live path.
  torchref / torchref-ssd — end-to-end torch reference-replica parity
          (VERDICT r3 #1): detect differential (fp32 both stacks +
          production-bf16 cross-check), per-image training-loss-loop
          differential, and the two-stack COCO mAP diff in two regimes,
          for the RetinaNet flagship (640) and the SSD-512 family.
  r101-multiscale — config 4 flagship-depth accuracy gate (R101,
          two-resolution multiscale train + eval).
"""
import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # detjax / scripts.* / tests.torch_ref imports
    sys.path.insert(0, _REPO)

import numpy as np
import jax

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset, make_train_iterator
from detjax.evaluation.evaluator import run_coco_eval
from detjax.train import fit

# ---------------------------------------------------------------------------
# Versioned gate evidence (VERDICT r4 weak #7): every parity table, tie-swap
# count and differential lands in a machine-readable JSON next to
# BENCH_r*.json, so the claims are re-verifiable without re-running the
# 2500-step trains. DETJAX_GATES_OUT overrides the path.
# ---------------------------------------------------------------------------

GATES_OUT = os.environ.get("DETJAX_GATES_OUT",
                           os.path.join(_REPO, "GATES_r05.json"))
_EVIDENCE = {}


def _record(gate: str, key: str, payload) -> None:
    _EVIDENCE.setdefault(gate, {})[key] = payload


def _flush_evidence() -> None:
    """Merge this invocation's evidence into the versioned artifact
    (called after every gate so a crash keeps earlier results)."""
    if not _EVIDENCE:
        return
    data = {}
    if os.path.exists(GATES_OUT):
        try:
            with open(GATES_OUT) as f:
                data = json.load(f)
        except (json.JSONDecodeError, OSError):
            data = {}
    for g, v in _EVIDENCE.items():
        d = data.setdefault(g, {})
        d.update(v)
        d["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(GATES_OUT, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"gate evidence -> {GATES_OUT}")


def _run(cfg, ds, steps, name, min_ap50):
    res = fit(cfg, make_train_iterator(ds, cfg), num_steps=steps,
              log_every=max(steps // 6, 1))
    state = res.state
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ev = run_coco_eval(variables, ds, cfg)
    print(name, {k: round(v, 4) for k, v in ev.stats.items() if k in
                 ("AP", "AP50", "AP75", "APs", "AR100")})
    print(f"{name} train img/s:", round(res.images_per_sec, 1))
    assert ev.stats["AP50"] > min_ap50, f"{name} gate failed: {ev.stats}"
    return variables


_QUICK_TRAINED = {}


def _trained_once(store: dict, setup, steps: int, name: str,
                  min_ap50: float, cache_file: str):
    """Train a gate model ONCE per process and share it across gates —
    the workload is fully deterministic (seeded synthetic data, seeded
    init, fixed steps), so every gate over the same setup would retrain
    the IDENTICAL model.

    DETJAX_GATE_CACHE=<dir> additionally persists the trained variables
    across PROCESSES (msgpack via flax.serialization): iterating on a
    gate's verification section then costs seconds, not the full train.
    Sound because the workload is deterministic — the cached model is
    byte-for-byte the one a retrain would produce. On a cache LOAD the
    AP50 assert re-runs through the full eval stack (cheap relative to
    the train), so a stale or hand-placed cache file can never make a
    gate pass vacuously (ADVICE r4 #2)."""
    import os

    cfg, ds = setup()
    if "v" in store:
        print(f"{name}: reusing the trained gate model "
              f"(deterministic workload)")
        return cfg, ds, store["v"]
    cache_dir = os.environ.get("DETJAX_GATE_CACHE")
    path = os.path.join(cache_dir, cache_file) if cache_dir else None
    if path and os.path.exists(path):
        import flax.serialization as fser

        from detjax.modeling import build_model

        _, target = build_model(cfg)
        with open(path, "rb") as f:
            store["v"] = fser.from_bytes(target, f.read())
        ev = run_coco_eval(store["v"], ds, cfg)
        print(f"{name}: loaded trained model from {path}, "
              f"AP50={ev.stats['AP50']:.4f} (re-asserted on cache load)")
        assert ev.stats["AP50"] > min_ap50, (path, ev.stats)
    else:
        store["v"] = _run(cfg, ds, steps, name, min_ap50)
        if path:
            import flax.serialization as fser

            os.makedirs(cache_dir, exist_ok=True)
            with open(path, "wb") as f:
                f.write(fser.to_bytes(store["v"]))
            print(f"{name}: cached the trained model to {path}")
    return cfg, ds, store["v"]


def _quick_setup():
    """The quick-gate workload (6 classes @256px, 8 images) shared by the
    quick/int8/export gates."""
    cfg = get_config("retinanet_r50_640", **{
        "model.image_size": (256, 256),
        "model.num_classes": 6,
        "model.frozen_backbone_bn": False,
        "train.batch_size": 8,
        "train.max_gt": 8,
        "train.learning_rate": 1e-3,
        "train.lr_schedule": "constant",
        "data.hflip_prob": 0.0,
        "data.random_crop": False,
        "eval.batch_size": 8,
    })
    ds = SyntheticDetectionDataset(num_images=8, image_size=(256, 256),
                                   num_classes=6, max_objects=3, seed=3)
    return cfg, ds


def _quick_trained(name: str):
    return _trained_once(_QUICK_TRAINED, _quick_setup, 1500, name, 0.6,
                         "quick_trained.msgpack")


def gate_quick():
    _quick_trained("quick")
    print("QUICK GATE PASSED")


def _hard_setup():
    """The flagship-scale gate workload: 80 classes, 640 px, crowds,
    small objects — the regime where quantization error and relowering
    drift actually surface (VERDICT r2 weak #2)."""
    cfg = get_config("retinanet_r50_640", **{
        "model.num_classes": 80,
        "model.frozen_backbone_bn": False,
        "train.batch_size": 8,
        "train.max_gt": 16,
        "train.learning_rate": 1e-3,
        "train.lr_schedule": "constant",
        "data.hflip_prob": 0.5,
        "data.random_crop": True,  # train crops (SURVEY.md §2 #14)
        "eval.batch_size": 8,
    })
    ds = SyntheticDetectionDataset(
        num_images=16, image_size=(640, 640), num_classes=80,
        max_objects=8, seed=7, size_range=(1.0 / 32.0, 1.0 / 3.0),
        crowd_prob=0.15)
    return cfg, ds


_HARD_TRAINED = {}


def _hard_trained(name: str):
    return _trained_once(_HARD_TRAINED, _hard_setup, 2500, name, 0.5,
                         "hard_trained.msgpack")


def gate_hard():
    cfg, ds, variables = _hard_trained("hard")

    # two-stage candidate selection vs exact global top-k on the TRAINED
    # model: identical final detections at the flagship shape
    from detjax.data.pipeline import make_eval_iterator
    from detjax.modeling import _detect_fn
    import dataclasses

    exact_cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, exact_candidates=True))
    batch = next(iter(make_eval_iterator(ds, cfg)))
    from detjax.data.pipeline import device_augment
    import jax.numpy as jnp

    imgs, _ = device_augment(jnp.asarray(batch["images"]),
                             jnp.zeros((batch["images"].shape[0], 1, 4)),
                             jax.random.PRNGKey(0), hflip_prob=0.0)
    d_two = _detect_fn(cfg)(variables, imgs)
    d_exact = _detect_fn(exact_cfg)(variables, imgs)
    # Same detection SET up to exact score ties. Divergences between the
    # selection paths are tie artifacts of bf16 logits: (a) rank order of
    # equal-scored detections differs (different sort keys), (b) at a
    # bit-equal score tie each path may keep a DIFFERENT (anchor, class)
    # member — same score, different box and possibly different label. So:
    # sorted score multisets must match exactly, tied-member swaps are
    # counted and bounded, and AP equality is asserted via the full
    # evaluator — the quantity the two-stage design actually claims.
    np.testing.assert_array_equal(np.asarray(d_two.num_valid),
                                  np.asarray(d_exact.num_valid))
    tie_swaps = 0
    for img_i in range(np.asarray(d_two.num_valid).shape[0]):
        nv = int(np.asarray(d_two.num_valid)[img_i])
        rows = []
        for d in (d_two, d_exact):
            r = np.concatenate(
                [np.asarray(d.scores)[img_i, :nv, None],
                 np.asarray(d.labels)[img_i, :nv, None].astype(np.float32),
                 np.asarray(d.boxes)[img_i, :nv]], axis=1)
            rows.append(r[np.lexsort(r.T[::-1])])
        a, b = rows
        # Sorted score multisets must be IDENTICAL. Within bit-equal score
        # ties, the two paths may keep a different (anchor, class) member
        # — observed as label and/or box swaps at exactly-equal scores
        # (the tied partner lives in the OTHER path's set). Those are
        # counted and bounded; AP equality below is the functional gate.
        np.testing.assert_array_equal(a[:, 0], b[:, 0])
        mism = ~np.all(np.isclose(a[:, 1:], b[:, 1:], atol=1e-4), axis=1)
        tie_swaps += int(mism.sum())
    total = int(np.asarray(d_two.num_valid).sum())
    assert tie_swaps <= max(2, total // 50), (
        f"{tie_swaps}/{total} box swaps — too many to be tie noise")

    # AP through the full evaluator: a tie-swapped box could in principle
    # match GT differently, so the claim is AP-negligible (≤0.2 mAP pts,
    # the parity-gate granularity), not bit-equal.
    ev_two = run_coco_eval(variables, ds, cfg)
    ev_exact = run_coco_eval(variables, ds, exact_cfg)
    for k in ev_two.stats:
        assert abs(ev_two.stats[k] - ev_exact.stats[k]) <= 2e-3, (
            k, ev_two.stats, ev_exact.stats)
    print("two-stage == exact candidates on trained model "
          f"({int(np.asarray(d_two.num_valid).sum())} detections, "
          f"{tie_swaps} tie-group box swaps, AP delta ≤ 2e-3)")
    print("HARD GATE PASSED")


def _ssd_setup():
    """The SSD-512 gate workload (benchmark config 2 at train scale)."""
    cfg = get_config("ssd_512", **{
        "model.num_classes": 12,
        "model.frozen_backbone_bn": False,
        "train.batch_size": 8,
        "train.max_gt": 8,
        "train.learning_rate": 1e-3,
        "train.lr_schedule": "constant",
        "data.hflip_prob": 0.0,
        "data.random_crop": False,
        "eval.batch_size": 8,
    })
    ds = SyntheticDetectionDataset(num_images=8, image_size=(512, 512),
                                   num_classes=12, max_objects=3, seed=11,
                                   size_range=(0.15, 0.5))
    return cfg, ds


_SSD_TRAINED = {}


def _ssd_trained(name: str):
    return _trained_once(_SSD_TRAINED, _ssd_setup, 1500, name, 0.5,
                         "ssd_trained.msgpack")


def gate_ssd():
    _ssd_trained("ssd")
    print("SSD GATE PASSED")


def gate_int8():
    """Train the quick-gate model, PTQ-quantize it (detjax/quant.py), and
    assert the int8 engine's AP50 matches the fp path on the trained
    model — the accuracy side of the int8 inference feature."""
    from detjax import quant
    from detjax.evaluation.evaluator import run_coco_eval

    cfg, ds, variables = _quick_trained("int8-fp-baseline")
    fp = run_coco_eval(variables, ds, cfg)
    qtree = _quantize_on_eval_stream(variables, ds, cfg)
    q = run_coco_eval(variables, ds, cfg,
                      detect_fn=lambda _, x: quant.detect_int8(qtree, x, cfg))
    print("fp  :", {k: round(fp.stats[k], 4) for k in ("AP", "AP50", "AP75")})
    print("int8:", {k: round(q.stats[k], 4) for k in ("AP", "AP50", "AP75")})
    assert q.stats["AP50"] > fp.stats["AP50"] - 0.02, (fp.stats, q.stats)
    assert q.stats["AP"] > fp.stats["AP"] - 0.05, (fp.stats, q.stats)
    print("INT8 GATE PASSED")


def gate_export():
    """Train the quick-gate model, export the serving artifact
    (detjax/export.py), and assert the ARTIFACT's AP matches the live
    detect path — accuracy through the deployment surface."""
    from detjax.export import load_detect, save_detect
    import tempfile, os

    cfg, ds, variables = _quick_trained("export-fp-baseline")
    fp = run_coco_eval(variables, ds, cfg)

    path = os.path.join(tempfile.mkdtemp(), "detect.stablehlo")
    save_detect(path, variables, cfg, batch_size=cfg.eval.batch_size)
    served_fn = load_detect(path)
    served = run_coco_eval(variables, ds, cfg,
                           detect_fn=lambda _, x: served_fn(x))
    print("live  :", {k: round(fp.stats[k], 4) for k in ("AP", "AP50", "AP75")})
    print("export:", {k: round(served.stats[k], 4)
                      for k in ("AP", "AP50", "AP75")})
    # bf16 relowering drift can reorder near-tied junk detections; AP on a
    # trained model must be unaffected beyond noise
    assert served.stats["AP50"] > fp.stats["AP50"] - 0.02, (fp.stats,
                                                            served.stats)
    assert served.stats["AP"] > fp.stats["AP"] - 0.05, (fp.stats,
                                                        served.stats)
    print(f"artifact: {os.path.getsize(path) / 1e6:.1f} MB")
    print("EXPORT GATE PASSED")


def _eval_stream_calibration(variables, ds, cfg):
    """The first (normalized) eval batch — the gates' PTQ calibration
    canvases (calibrate once at the training canvas, serve any bucket)."""
    import jax.numpy as jnp

    from detjax.data.pipeline import device_augment, make_eval_iterator

    batch = next(iter(make_eval_iterator(ds, cfg)))
    imgs = jnp.asarray(batch["images"])
    if imgs.dtype == jnp.uint8:
        imgs, _ = device_augment(
            imgs, jnp.zeros((imgs.shape[0], 1, 4), jnp.float32),
            jax.random.PRNGKey(0), hflip_prob=0.0,
            mean=cfg.data.mean, std=cfg.data.std)
    return imgs


def _quantize_on_eval_stream(variables, ds, cfg):
    """Calibrate PTQ activation ranges on the first (normalized) eval
    batch — the gates' calibration protocol."""
    from detjax import quant

    return quant.quantize_model(
        variables, cfg, _eval_stream_calibration(variables, ds, cfg))


def gate_hard_int8():
    """Int8 PTQ at FLAGSHIP scale — 80 classes, 640 px, crowds, small
    objects (VERDICT r2 #4): trains the hard-gate model on the real chip
    and asserts the int8 engine's AP within tight deltas of fp."""
    from detjax import quant
    from detjax.evaluation.evaluator import run_coco_eval

    cfg, ds, variables = _hard_trained("hard-int8-fp-baseline")
    fp = run_coco_eval(variables, ds, cfg)
    qtree = _quantize_on_eval_stream(variables, ds, cfg)
    q = run_coco_eval(variables, ds, cfg,
                      detect_fn=lambda _, x: quant.detect_int8(qtree, x, cfg))
    print("fp  :", {k: round(fp.stats[k], 4)
                    for k in ("AP", "AP50", "AP75", "APs")})
    print("int8:", {k: round(q.stats[k], 4)
                    for k in ("AP", "AP50", "AP75", "APs")})
    assert q.stats["AP50"] > fp.stats["AP50"] - 0.02, (fp.stats, q.stats)
    assert q.stats["AP"] > fp.stats["AP"] - 0.05, (fp.stats, q.stats)
    print("HARD-INT8 GATE PASSED")


def gate_hard_export():
    """StableHLO export at FLAGSHIP scale — 80 classes, 640 px (VERDICT
    r2 #4): bf16-relowering drift must stay AP-negligible through the
    deployment artifact at the shape production serves."""
    import os
    import tempfile

    from detjax.evaluation.evaluator import run_coco_eval
    from detjax.export import load_detect, save_detect

    cfg, ds, variables = _hard_trained("hard-export-fp-baseline")
    fp = run_coco_eval(variables, ds, cfg)
    path = os.path.join(tempfile.mkdtemp(), "detect640.stablehlo")
    save_detect(path, variables, cfg, batch_size=cfg.eval.batch_size)
    served_fn = load_detect(path)
    served = run_coco_eval(variables, ds, cfg,
                           detect_fn=lambda _, x: served_fn(x))
    print("live  :", {k: round(fp.stats[k], 4)
                      for k in ("AP", "AP50", "AP75", "APs")})
    print("export:", {k: round(served.stats[k], 4)
                      for k in ("AP", "AP50", "AP75", "APs")})
    assert served.stats["AP50"] > fp.stats["AP50"] - 0.02, (
        fp.stats, served.stats)
    assert served.stats["AP"] > fp.stats["AP"] - 0.05, (
        fp.stats, served.stats)
    print(f"artifact: {os.path.getsize(path) / 1e6:.1f} MB")
    print("HARD-EXPORT GATE PASSED")


def gate_r101_multiscale():
    """Flagship-depth accuracy gate for benchmark config 4 (VERDICT r3
    #8): the R101 preset TRAINS multi-scale — two canvas resolutions
    cycled through per-resolution precompiled steps sharing one
    TrainState (train/multiscale.py), fused on-device augmentation live
    (uint8 batches, normalize+hflip inside the jit step) — and AP is
    asserted at BOTH eval resolutions."""
    import dataclasses

    from detjax.train import make_train_state
    from detjax.train.multiscale import (MultiScaleIterator,
                                         make_multiscale_train_step)

    cfg = get_config("retinanet_r101_fpn", **{
        "model.num_classes": 12,
        "model.frozen_backbone_bn": False,
        "train.batch_size": 8,
        "train.max_gt": 8,
        "train.learning_rate": 1e-3,
        "train.lr_schedule": "constant",
        "data.hflip_prob": 0.5,  # on-device augmentation live in the step
        "data.random_crop": False,
        "eval.batch_size": 8,
    })
    assert cfg.model.backbone_depth == 101
    scales = ((512, 512), (640, 640))
    ds = SyntheticDetectionDataset(
        num_images=12, image_size=(640, 640), num_classes=12,
        max_objects=4, seed=13, size_range=(0.08, 0.4))

    state = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_multiscale_train_step(cfg, scales)
    it = iter(MultiScaleIterator(ds, cfg, scales, seed=0))
    steps = 2500
    import time

    t0 = time.time()
    for i in range(steps):
        state, m = step(state, next(it))
        if (i + 1) % 500 == 0 or i + 1 == steps:
            print(f"  step {i + 1}/{steps} loss "
                  f"{float(np.asarray(m['loss'])):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    for hw in scales:  # the model must hold up at BOTH eval resolutions
        cfg_e = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, image_size=hw))
        ev = run_coco_eval(variables, ds, cfg_e)
        print(f"r101-multiscale eval @{hw[0]}:",
              {k: round(ev.stats[k], 4)
               for k in ("AP", "AP50", "AP75", "APs")})
        assert ev.stats["AP50"] > 0.5, (hw, ev.stats)
    print("R101-MULTISCALE GATE PASSED")


def _diff_detections(det, det16, t_dets):
    """fp32 detect differential + bf16 production cross-check, shared by
    gate_torchref / gate_torchref-ssd. ``det``/``det16``: detjax
    Detections (fp32-highest / production bf16) on the same canvases;
    ``t_dets``: the torch replica's [(boxes, scores, labels)] per image."""
    max_sd, max_bd, total, swaps = 0.0, 0.0, 0, 0
    for i, (tb, ts, tl) in enumerate(t_dets):
        nv = int(np.asarray(det.num_valid)[i])
        assert abs(nv - len(ts)) <= 1, (
            f"image {i}: detjax {nv} vs torch {len(ts)} detections")
        n = min(nv, len(ts))
        jb = np.asarray(det.boxes)[i, :n]
        js = np.asarray(det.scores)[i, :n]
        jl = np.asarray(det.labels)[i, :n]
        to = np.lexsort((tl[:n], -ts[:n]))
        jo = np.lexsort((jl, -js))
        np.testing.assert_allclose(js[jo], ts[to], atol=5e-3, rtol=1e-3)
        drift = float(np.abs(js[jo] - ts[to]).max())
        max_sd = max(max_sd, drift)
        # Untied rows must carry the same label and box. "Untied" is
        # drift-coupled: two adjacent scores closer than 4× the measured
        # cross-stack score drift of THIS image can legitimately order
        # differently in the two stacks — that's a tie swap, not a
        # mismatch. With true-fp32 matmuls on both sides drift is ~1e-6
        # and the floor (1e-4) governs, keeping the assert strong.
        tss = ts[to]
        gap_t = max(1e-4, 4.0 * drift)
        gap = (np.abs(np.diff(tss, prepend=np.inf)) > gap_t) & \
              (np.abs(np.diff(tss, append=-np.inf)) > gap_t)
        mism = (jl[jo] != tl[to]) | ~np.all(
            np.isclose(jb[jo], tb[to], atol=1.0), axis=1)
        assert not np.any(mism & gap), f"image {i}: untied row mismatch"
        swaps += int(np.sum(mism & ~gap))
        if np.any(gap):
            max_bd = max(max_bd, float(
                np.abs(jb[jo][gap] - tb[to][gap]).max()))
        total += n
        # bf16 production path: the CONFIDENT detections (score > 0.5 —
        # well away from junk near the 0.05 floor) must agree as a
        # multiset: same labels, scores within bf16 drift. Rank-aligned
        # comparison would be tie-flaky where bf16 reorders near-equal
        # scores.
        conf = ts[to] > 0.5
        kc = int(conf.sum())
        if kc:
            s16 = np.asarray(det16.scores)[i]
            l16 = np.asarray(det16.labels)[i]
            np.testing.assert_allclose(
                np.sort(s16[:kc])[::-1], np.sort(ts[to][conf])[::-1],
                atol=0.03)
            assert sorted(l16[:kc].tolist()) == sorted(
                tl[to][conf].tolist()), (i, l16[:kc], tl[to][conf])
    print(f"detect differential: {total} detections, max |Δscore| "
          f"{max_sd:.2e}, max |Δbox| {max_bd:.3f} px, {swaps} tie swaps "
          f"(fp32 both stacks); bf16 confident detections verified")
    return {"detections": total, "max_abs_dscore": max_sd,
            "max_abs_dbox_px": max_bd, "tie_swaps": swaps}


def _two_stack_map(variables, ds_map, regime, num_classes, fp32_proto,
                   proto_cfg, torch_eval, use_protocol: bool = False,
                   torch_stats=None):
    """Two-stack COCO mAP comparison for one val regime: detjax runs its
    production pipeline (fp32-highest + production-bf16 legs), the torch
    replica runs ``torch_eval(rec) -> (boxes, scores, labels)`` per raw
    image; all 12 COCOeval stats are diffed and asserted.

    ``use_protocol=True``: both detjax legs run the VARIABLE-geometry
    production evaluator (evaluation/protocol.py bucketed per-image
    canvases) instead of the fixed-canvas path — the val2017 regime.
    ``torch_stats``: precomputed torch-replica stats dict (skips the
    torch loop — used when several detjax legs diff against one torch
    run). Returns the evidence payload (stats tables + worst deltas)."""
    import time

    from detjax.evaluation.coco_map import COCOMetric
    from detjax.evaluation.evaluator import _gt_provider
    from detjax.evaluation.protocol import run_coco_eval_protocol

    eval_fn = run_coco_eval_protocol if use_protocol else run_coco_eval
    with jax.default_matmul_precision("highest"):
        ev_jax = eval_fn(variables, ds_map, fp32_proto)
    ev_jax16 = eval_fn(variables, ds_map, proto_cfg)

    if torch_stats is None:
        gt_of = _gt_provider(ds_map)
        metric = COCOMetric(category_ids=list(range(num_classes)))
        t0 = time.time()
        for i in range(len(ds_map)):
            rec = ds_map[i]
            tb, ts, tl = torch_eval(rec)
            metric.add(rec["image_id"], gt_of(rec["image_id"]), tb, ts, tl)
            print(f"  torch stack [{regime}] {i + 1}/{len(ds_map)} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        torch_stats = metric.compute().stats

    print(f"[{regime}]" + (" (variable-geometry protocol eval)"
                           if use_protocol else ""))
    print(f"{'stat':>6} {'detjax':>8} {'det-bf16':>9} {'torchref':>9} "
          f"{'delta':>8} {'d-bf16':>8}")
    worst, worst16, worst16_ar1 = 0.0, 0.0, 0.0
    for key in ev_jax.stats:
        d = ev_jax.stats[key] - torch_stats[key]
        d16 = ev_jax16.stats[key] - torch_stats[key]
        worst = max(worst, abs(d))
        # AR1 gets its own bf16 bound: with max_dets=1 the stat is a step
        # function of the per-image score ARGMAX, so in a mid-confidence
        # regime (many closely-spaced scores) one bf16 score reorder
        # swaps WHICH detection is "the one" and moves AR1 by a whole
        # 1/num_gt quantum — unlike the AP stats, where a reorder only
        # shifts one PR-curve sample. Measured: mid regime AR1 drift
        # 0.0242 with every AP stat <= 0.002.
        if key == "AR1":
            worst16_ar1 = abs(d16)
        else:
            worst16 = max(worst16, abs(d16))
        print(f"{key:>6} {ev_jax.stats[key]:8.4f} "
              f"{ev_jax16.stats[key]:9.4f} "
              f"{torch_stats[key]:9.4f} {d:+8.4f} {d16:+8.4f}")
    assert worst <= 0.002, (
        f"two-stack mAP parity FAILED [{regime}]: worst |Δ| "
        f"{worst:.4f} > 0.002 (the north star's ±0.2 mAP points)")
    assert worst16 <= 0.01, (
        f"production-bf16 mAP drift {worst16:.4f} > 0.01 [{regime}] — "
        "bf16 box drift should only flip IoU>=0.9 matches")
    assert worst16_ar1 <= 0.05, (
        f"production-bf16 AR1 drift {worst16_ar1:.4f} > 0.05 [{regime}]")
    print(f"two-stack mAP parity [{regime}]: worst |Δ| {worst:.4f} "
          f"<= 0.002 on all 12 stats (production bf16: "
          f"{worst16:.4f} <= 0.01, AR1 {worst16_ar1:.4f} <= 0.05)")
    return {"regime": regime, "protocol_eval": use_protocol,
            "detjax_fp32": dict(ev_jax.stats),
            "detjax_bf16": dict(ev_jax16.stats),
            "torchref": dict(torch_stats),
            "worst_abs_delta_fp32": worst,
            "worst_abs_delta_bf16": worst16,
            "bf16_ar1_abs_delta": worst16_ar1}


def gate_torchref():
    """End-to-end torch reference-replica parity at FLAGSHIP shape
    (VERDICT r3 #1): the trained hard-gate model (R50, 640 px, 80
    classes) runs through BOTH stacks — detjax's fused on-chip detect and
    a faithful torch rebuild of the reference's eval branch
    (tests/torch_ref/eval_branch.py: decode → clip → score>0.05 →
    per-class Python NMS loop → rescale) — plus both loss
    implementations (vectorized vs per-image Python loop), and a
    two-stack COCO mAP comparison under the reference's min-608/max-1024
    eval protocol. Weights cross stacks via export_full_detector
    (round-trip identity pinned in tests/test_torch_e2e.py)."""
    import dataclasses
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp

    from detjax.data.pipeline import make_eval_iterator
    from detjax.data.transforms import pad_annotations
    from detjax.modeling import detect_u8
    from detjax.models.detector import build_detector
    from detjax.modeling import anchor_config
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.losses import detection_loss
    from detjax.utils.torch_import import export_full_detector
    from tests.torch_ref.eval_branch import (
        detector_forward_t, eval_branch_t, loss_loop_t, normalize_t,
        postprocess_t)

    cfg, ds, variables = _hard_trained("torchref")
    stages = (3, 4, 6, 3)
    k = cfg.model.num_classes
    sd = export_full_detector(variables["params"], variables["batch_stats"],
                              depth=cfg.model.backbone_depth)

    # ---- (a) flagship-shape detect differential: identical 640 canvases,
    # fp32 on both stacks (bit-comparability), bf16 production cross-check
    fp32_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="float32"))
    batch = next(iter(make_eval_iterator(ds, cfg)))
    canvases = np.asarray(batch["images"])[:3]
    assert canvases.dtype == np.uint8
    # "fp32" convs on TPU default to bf16 MXU passes (XLA's DEFAULT
    # precision) — ~1e-3 relative logit drift vs torch's true-fp32 CPU
    # convs, enough to reorder near-tie detections. The bit-comparability
    # leg forces genuine fp32 accumulation (bf16x6 passes) on-chip; the
    # production-precision leg (det16) stays outside the context.
    with jax.default_matmul_precision("highest"):
        det = detect_u8(variables, canvases, fp32_cfg)
    det16 = detect_u8(variables, canvases, cfg)

    t0 = time.time()
    x_nchw = normalize_t(canvases, cfg.data.mean, cfg.data.std)
    t_cls, t_reg = detector_forward_t(sd, x_nchw, stages, k)
    print(f"torch replica forward ×{len(canvases)} @640: "
          f"{time.time() - t0:.1f}s")

    t_dets = [postprocess_t(
        t_cls[i], t_reg[i], cfg.model.image_size,
        score_threshold=cfg.eval.score_threshold,
        iou_threshold=cfg.eval.nms_iou_threshold,
        max_detections=cfg.eval.max_detections)
        for i in range(len(canvases))]
    _record("torchref", "detect_differential",
            _diff_detections(det, det16, t_dets))

    # ---- (c) training-loss differential: vectorized vs per-image loop
    nb = 8
    imgs, gtb, gtl = [], [], []
    for i in range(nb):
        rec = ds[i]
        b, l = pad_annotations(rec["boxes"], rec["labels"],
                               cfg.train.max_gt)
        imgs.append(rec["image"])
        gtb.append(b)
        gtl.append(l)
    imgs_u8 = np.stack(imgs)
    gtb = np.stack(gtb)
    gtl = np.stack(gtl)
    x = normalize_t(imgs_u8, cfg.data.mean, cfg.data.std)  # NCHW fp32
    x_nhwc = np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))

    module = build_detector(fp32_cfg.model)
    cls, reg = module.apply(variables, jnp.asarray(x_nhwc), train=False)
    anchors = jnp.asarray(
        anchors_for_shape(cfg.model.image_size, anchor_config(cfg)))
    out = detection_loss(
        cls, reg, anchors, jnp.asarray(gtb), jnp.asarray(gtl),
        fg_iou_threshold=cfg.train.fg_iou_threshold,
        bg_iou_threshold=cfg.train.bg_iou_threshold,
        alpha=cfg.train.focal_alpha, gamma=cfg.train.focal_gamma,
        beta=cfg.train.smooth_l1_beta, box_std=cfg.model.box_std)
    t0 = time.time()
    t_cl, t_rl = loss_loop_t(
        sd, x_nhwc, gtb, gtl, stages, k,
        fg=cfg.train.fg_iou_threshold, bg=cfg.train.bg_iou_threshold,
        alpha=cfg.train.focal_alpha, gamma=cfg.train.focal_gamma,
        beta=cfg.train.smooth_l1_beta)
    j_cl, j_rl = float(out.cls_loss), float(out.reg_loss)
    print(f"loss differential (bs={nb} @640, torch loop {time.time() - t0:.0f}s): "
          f"cls {j_cl:.6f} vs {t_cl:.6f}, reg {j_rl:.6f} vs {t_rl:.6f}")
    assert abs(j_cl - t_cl) <= max(2e-3 * abs(t_cl), 2e-5), (j_cl, t_cl)
    assert abs(j_rl - t_rl) <= max(2e-3 * abs(t_rl), 2e-5), (j_rl, t_rl)

    # ---- (b) two-stack COCO mAP under the reference eval protocol.
    # BOTH stacks resize their own raw images independently: the torch
    # replica with PIL's protocol Resizer (eval_branch.resize_protocol_t),
    # detjax with its production pipeline (native C++ resize — bit-
    # identical to PIL, pinned in tests/test_native.py). TWO val regimes:
    #   * the 16 train-set images (AP ~0.81) — agreement on confident,
    #     well-separated detections;
    #   * a HELD-OUT set of 64 fresh images from the same distribution
    #     (seed 77 vs the train set's 7; AP ~0.02, the overfit gate model
    #     barely generalizes) — agreement on a sea of near-threshold
    #     detections, where score ties / boundary effects are maximally
    #     likely to diverge. Exactness across BOTH score distributions is
    #     the strongest on-box form of the parity claim.
    # Every synthetic source is 640x640, so the min-608/max-1024 rule
    # yields a 608x608 canvas for each; pinning detjax's static canvas to
    # 608 makes its fixed-canvas geometry coincide with the reference's
    # variable-canvas geometry for this val set (exactly how a production
    # deployment picks its canvas for a known protocol — zero pad ring,
    # identical conv border environment). Two detjax legs per regime:
    #   * fp32 + highest-precision matmuls — the parity-of-the-math claim
    #     (the reference stack is fp32 CUDA/CPU): |Δ| <= 0.002 hard.
    #   * production bf16 — the as-deployed number, asserted at a
    #     documented looser bound: bf16 MXU box regression drifts boxes
    #     ~0.1 px, which flips matches only at the IoU 0.90:0.95 COCOeval
    #     thresholds (measured: AP50/AP75 EXACT, worst stat 0.0032).
    ds_val = SyntheticDetectionDataset(
        num_images=64, image_size=(640, 640), num_classes=80,
        max_objects=8, seed=77, size_range=(1.0 / 32.0, 1.0 / 3.0),
        crowd_prob=0.15)
    proto_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=(608, 608)),
        data=dataclasses.replace(cfg.data,
                                 eval_scale_minmax=(608, 1024)))
    fp32_proto = dataclasses.replace(
        proto_cfg, model=dataclasses.replace(proto_cfg.model,
                                             dtype="float32"))
    def torch_eval(rec):
        return eval_branch_t(
            sd, rec["image"], stages, k,
            mean=cfg.data.mean, std=cfg.data.std,
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            max_detections=cfg.eval.max_detections)

    _record("torchref", "loss_differential",
            {"detjax": [j_cl, j_rl], "torchref": [float(t_cl), float(t_rl)]})
    for ds_map, regime in ((ds, "train-set 16 img"),
                           (ds_val, "held-out 64 img")):
        _record("torchref", f"two_stack_map[{regime}]",
                _two_stack_map(variables, ds_map, regime, k, fp32_proto,
                               proto_cfg, torch_eval))
        _flush_evidence()
    print("TORCHREF GATE PASSED")


def gate_torchref_ssd():
    """The same end-to-end torch reference-replica parity for the SSD-512
    family (benchmark config 2): per-level independent predictors + SSD
    per-level absolute anchor sizes, at the preset's full 512 px. Detect
    differential (fp32 both stacks + production bf16), per-image
    training-loss-loop differential, and the two-stack COCO mAP in two
    regimes (train-set / held-out). The SSD eval protocol is a fixed
    512×512 canvas (the preset's deployment shape): sources are 512×512,
    so BOTH stacks see identity-scale canvases and the geometries
    coincide with zero pad ring — same reasoning as the RetinaNet gate's
    608 pin."""
    import dataclasses
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp

    from detjax.data.pipeline import make_eval_iterator
    from detjax.data.transforms import pad_annotations
    from detjax.modeling import anchor_config, detect_u8
    from detjax.models.detector import build_detector
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.losses import detection_loss
    from detjax.utils.torch_import import export_full_detector
    from tests.torch_ref.eval_branch import (
        detector_forward_t, eval_branch_t, loss_loop_t, normalize_t,
        postprocess_t)

    cfg, ds, variables = _ssd_trained("torchref-ssd")
    stages = (3, 4, 6, 3)
    k = cfg.model.num_classes
    anchor_kw = {"ratios": cfg.model.anchor_ratios,
                 "per_level_sizes": cfg.model.anchor_per_level_sizes}
    sd = export_full_detector(variables["params"], variables["batch_stats"],
                              depth=cfg.model.backbone_depth, family="ssd")

    # ---- (a) detect differential at 512: identical canvases, fp32 both
    # stacks, production-bf16 cross-check (see gate_torchref for the
    # matmul-precision reasoning)
    fp32_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="float32"))
    batch = next(iter(make_eval_iterator(ds, cfg)))
    canvases = np.asarray(batch["images"])[:3]
    assert canvases.dtype == np.uint8
    with jax.default_matmul_precision("highest"):
        det = detect_u8(variables, canvases, fp32_cfg)
    det16 = detect_u8(variables, canvases, cfg)

    t0 = time.time()
    x_nchw = normalize_t(canvases, cfg.data.mean, cfg.data.std)
    t_cls, t_reg = detector_forward_t(sd, x_nchw, stages, k, family="ssd")
    print(f"torch replica forward ×{len(canvases)} @512: "
          f"{time.time() - t0:.1f}s")
    t_dets = [postprocess_t(
        t_cls[i], t_reg[i], cfg.model.image_size,
        score_threshold=cfg.eval.score_threshold,
        iou_threshold=cfg.eval.nms_iou_threshold,
        max_detections=cfg.eval.max_detections, anchor_kw=anchor_kw)
        for i in range(len(canvases))]
    _diff_detections(det, det16, t_dets)

    # ---- (c) training-loss differential: vectorized vs per-image loop
    nb = 8
    imgs, gtb, gtl = [], [], []
    for i in range(nb):
        rec = ds[i]
        b, l = pad_annotations(rec["boxes"], rec["labels"],
                               cfg.train.max_gt)
        imgs.append(rec["image"])
        gtb.append(b)
        gtl.append(l)
    x = normalize_t(np.stack(imgs), cfg.data.mean, cfg.data.std)
    x_nhwc = np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))
    gtb, gtl = np.stack(gtb), np.stack(gtl)

    module = build_detector(fp32_cfg.model)
    cls, reg = module.apply(variables, jnp.asarray(x_nhwc), train=False)
    anchors = jnp.asarray(
        anchors_for_shape(cfg.model.image_size, anchor_config(cfg)))
    out = detection_loss(
        cls, reg, anchors, jnp.asarray(gtb), jnp.asarray(gtl),
        fg_iou_threshold=cfg.train.fg_iou_threshold,
        bg_iou_threshold=cfg.train.bg_iou_threshold,
        alpha=cfg.train.focal_alpha, gamma=cfg.train.focal_gamma,
        beta=cfg.train.smooth_l1_beta, box_std=cfg.model.box_std)
    t0 = time.time()
    t_cl, t_rl = loss_loop_t(
        sd, x_nhwc, gtb, gtl, stages, k, family="ssd",
        anchor_kw=anchor_kw,
        fg=cfg.train.fg_iou_threshold, bg=cfg.train.bg_iou_threshold,
        alpha=cfg.train.focal_alpha, gamma=cfg.train.focal_gamma,
        beta=cfg.train.smooth_l1_beta)
    j_cl, j_rl = float(out.cls_loss), float(out.reg_loss)
    print(f"loss differential (bs={nb} @512, torch loop "
          f"{time.time() - t0:.0f}s): "
          f"cls {j_cl:.6f} vs {t_cl:.6f}, reg {j_rl:.6f} vs {t_rl:.6f}")
    assert abs(j_cl - t_cl) <= max(2e-3 * abs(t_cl), 2e-5), (j_cl, t_cl)
    assert abs(j_rl - t_rl) <= max(2e-3 * abs(t_rl), 2e-5), (j_rl, t_rl)

    # ---- (b) two-stack COCO mAP: fixed-512 protocol, identity scale on
    # both stacks (512 sources). Train-set (confident detections) +
    # held-out (near-threshold regime) — same two-regime reasoning as the
    # RetinaNet gate.
    ds_val = SyntheticDetectionDataset(
        num_images=24, image_size=(512, 512), num_classes=12,
        max_objects=3, seed=99, size_range=(0.15, 0.5))
    fp32_proto = fp32_cfg

    def torch_eval(rec):
        return eval_branch_t(
            sd, rec["image"], stages, k, family="ssd",
            mean=cfg.data.mean, std=cfg.data.std,
            min_side=512, max_side=512,  # fixed-512 SSD protocol
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            max_detections=cfg.eval.max_detections, anchor_kw=anchor_kw)

    for ds_map, regime in ((ds, "train-set 8 img"),
                           (ds_val, "held-out 24 img")):
        _record("torchref-ssd", f"two_stack_map[{regime}]",
                _two_stack_map(variables, ds_map, regime, k, fp32_proto,
                               cfg, torch_eval))
    print("TORCHREF-SSD GATE PASSED")


# ---------------------------------------------------------------------------
# Variable-geometry parity gates (VERDICT r4 next #1/#2/#3/#4/#5): the
# production bucketed protocol evaluator vs the torch replica's true
# per-image variable canvases, on mixed COCO-typical shapes, fed from real
# JPEG files through the production loader.
# ---------------------------------------------------------------------------

# COCO-typical val2017 source shapes (landscape/portrait/odd aspect/square).
# Protocol canvases: (832,608) ×3, (608,832), (608,608), (608,928),
# (928,608) ×2 — five distinct buckets, incl. transposes and a pad-rounding
# ring (427×640 → content 608×911 on a 608×928 canvas).
COCO_TYPICAL_SIZES = ((640, 480), (480, 640), (500, 375), (427, 640),
                      (612, 612), (640, 426), (333, 500), (375, 500))


def _mixed_jpeg_dataset(tag: str, **synth_kw):
    """A mixed-geometry synthetic val set materialized as real JPEG files
    + COCO JSON (idempotent per tag), loaded back through the PRODUCTION
    path: CocoDataset + in-repo libjpeg decode. Returns (dataset,
    image_dir). The torch replica leg decodes the same bytes with PIL —
    so a two-stack mAP run covers the decode segment too."""
    import tempfile

    from detjax.data import CocoDataset
    from scripts.make_file_dataset import dump_dataset_as_coco

    ds_src = SyntheticDetectionDataset(**synth_kw)
    base = os.environ.get("DETJAX_GATE_CACHE") or tempfile.gettempdir()
    out = os.path.join(base, f"detjax_gate_{tag}")
    ann = dump_dataset_as_coco(ds_src, out)
    img_dir = os.path.join(out, "images")
    return CocoDataset(ann, img_dir), img_dir


def _torch_eval_jpeg(sd, img_dir, stages, k, cfg, **eval_kw):
    """Per-record torch-replica eval over the ON-DISK JPEG (independent
    PIL decode — the production leg uses the in-repo libjpeg binding)."""
    from PIL import Image

    from tests.torch_ref.eval_branch import eval_branch_t

    def torch_eval(rec):
        with Image.open(os.path.join(img_dir, rec["file_name"])) as im:
            img = np.asarray(im.convert("RGB"), np.uint8)
        return eval_branch_t(
            sd, img, stages, k,
            mean=cfg.data.mean, std=cfg.data.std,
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            max_detections=cfg.eval.max_detections, **eval_kw)

    return torch_eval


def _proto_cfgs(cfg):
    """(fp32-highest, production-bf16) configs for the variable-geometry
    protocol evaluator (min-608/max-1024 per-image canvases).

    Both legs carry the EVALUATOR-grade candidate budget (pre_nms_top_k
    16384, exact oracle selection): the reference's eval branch keeps
    every score>0.05 (anchor, class) pair before per-class NMS, and the
    serving prefilter (k=1000 anchor-first) measurably truncates dense
    mid-confidence regimes — torchref-mid at k=1000: fp32 worst |Δ|
    0.0409 all on recall stats (AR100 −0.027, ARl −0.041), detjax
    strictly below torch. A candidate ranked below k can still reach the
    final top-100 because NMS collapses the candidates above it. bf16
    stays the production NUMERICS leg; candidate budget is an eval-run
    knob, not a numerics one (the serving presets keep k=1000/512)."""
    import dataclasses

    proto_cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, eval_scale_minmax=(608, 1024)),
        eval=dataclasses.replace(cfg.eval, pre_nms_top_k=16384,
                                 exact_candidates=True))
    fp32_proto = dataclasses.replace(
        proto_cfg, model=dataclasses.replace(proto_cfg.model,
                                             dtype="float32"))
    return fp32_proto, proto_cfg


def gate_torchref_mixed():
    """VARIABLE-geometry end-to-end parity (VERDICT r4 next #1 + #2 + #5):
    the production evaluator reproduces the reference's per-image
    min-608/max-1024 pad-32 canvases (evaluation/protocol.py bucketed
    engines) on a mixed COCO-typical-shape val set stored as REAL JPEG
    files — detjax leg through CocoDataset + in-repo libjpeg decode, torch
    replica leg through PIL decode + true per-image variable Resizer
    (eval_branch.resize_protocol_t). fp32 worst |Δ| ≤ 0.002 on all 12
    stats; plus the int8 PTQ engine diffed against the TORCH replica (not
    just detjax-fp) on the same set, both calibration modes."""
    from detjax.utils.torch_import import export_full_detector

    cfg, ds_train, variables = _hard_trained("torchref-mixed")
    stages = (3, 4, 6, 3)
    k = cfg.model.num_classes
    sd = export_full_detector(variables["params"], variables["batch_stats"],
                              depth=cfg.model.backbone_depth)

    ds_map, img_dir = _mixed_jpeg_dataset(
        "mixed_val", num_images=24, num_classes=80, max_objects=8,
        seed=123, size_range=(1.0 / 32.0, 1.0 / 3.0), crowd_prob=0.15,
        image_sizes=COCO_TYPICAL_SIZES)
    fp32_proto, proto_cfg = _proto_cfgs(cfg)
    torch_eval = _torch_eval_jpeg(sd, img_dir, stages, k, cfg)

    payload = _two_stack_map(
        variables, ds_map, "mixed-geometry held-out 24 img (real JPEG)",
        k, fp32_proto, proto_cfg, torch_eval, use_protocol=True)
    _record("torchref-mixed", "two_stack_map", payload)
    _flush_evidence()

    # int8 column vs the TORCH replica (VERDICT r4 next #5): the serving
    # engine through the same bucketed protocol evaluator, both
    # calibration modes, ΔmAP against the reference stack itself.
    from detjax import quant
    from detjax.evaluation.protocol import run_coco_eval_protocol

    calib = _eval_stream_calibration(variables, ds_train, cfg)
    for mode in ("absmax", "p999"):
        qtree = quant.quantize_model(variables, cfg, calib, calib_mode=mode)

        def engine_for(bcfg, qt=qtree):
            return lambda _v, u8: quant.detect_int8_u8(qt, u8, bcfg)

        ev = run_coco_eval_protocol(variables, ds_map, proto_cfg,
                                    detect_fn_for=engine_for)
        deltas = {s: ev.stats[s] - payload["torchref"][s]
                  for s in ev.stats}
        worst = max(abs(d) for d in deltas.values())
        print(f"int8[{mode}] vs torch replica (mixed geometry): "
              + " ".join(f"{s}={ev.stats[s]:.4f}({deltas[s]:+.4f})"
                         for s in ("AP", "AP50", "AP75")))
        _record("torchref-mixed", f"int8_{mode}",
                {"stats": dict(ev.stats), "delta_vs_torchref": deltas,
                 "worst_abs_delta": worst})
        assert abs(deltas["AP"]) <= 0.05 and abs(deltas["AP50"]) <= 0.05, (
            f"int8[{mode}] drifted beyond the documented 0.05 bound vs "
            f"the torch replica: {deltas}")
    _flush_evidence()
    print("TORCHREF-MIXED GATE PASSED")


_MID_TRAINED = {}


def _mid_setup():
    """A gate model that GENERALIZES (VERDICT r4 next #4): trained on 768
    distinct scenes so held-out detections land at a val2017-like
    operating point (mixed confident + marginal), not the overfit
    (AP≈0.8) or junk (AP≈0.02) extremes of the other two regimes.

    Recipe notes, all measured on this box:
    - lr HALVED vs _hard_setup: at 1e-3 the many-scene run diverged late
      (cls_loss 305, grad_norm 9.8e4 at step 1664 → AP 0.0) — the varied
      scene stream keeps unfrozen BN statistics moving, and one focal
      spike poisons them; 16-scene memorization never hits this. 5e-4
      descends smoothly but needs ~6000 steps to clear the train
      AP50>0.3 floor (2500 → 0.168).
    - 12 classes, not 80: the synthetic palette draws 80 class colors
      with 22 pairs closer than 30/255 RGB distance (3 pairs < 15) —
      irreducible class confusion that capped HELD-OUT AP at 0.0165
      (junk-regime territory, defeating this gate's purpose) while
      recall was fine (AR100 0.216); 40 classes still held held-out AP
      to 0.039 at this training budget (and 768 scenes / 9000 steps
      UNDERFIT even the train set to AP50 0.067 — scene count must stay
      matched to the step budget). 12 well-separated colors make the
      classification genuinely learnable, which is what an AP well
      inside (0.05, 0.95) requires; multi-class structure (per-class
      NMS, class-aware decode) is still exercised, and 80-class
      coverage stays with the other torchref gates.
    - the TRAIN stream cycles the same COCO-typical mixed geometries as
      the held-out protocol set — the reference trains on variable-size
      sources too (SURVEY.md §2 #14); an all-640² train set leaves the
      protocol evaluator's 1.2–1.8× upscales out of distribution.
    - min object size 1/24 (not 1/32): a 1/32 object on a 375px source
      is ~12px, sub-anchor-stride after the protocol resize's blur."""
    cfg = get_config("retinanet_r50_640", **{
        "model.num_classes": 12,
        "model.frozen_backbone_bn": False,
        "train.batch_size": 8,
        "train.max_gt": 16,
        "train.learning_rate": 5e-4,
        "train.lr_schedule": "constant",
        "data.hflip_prob": 0.5,
        "data.random_crop": True,
        "eval.batch_size": 8,
    })
    ds = SyntheticDetectionDataset(
        num_images=256, num_classes=12,
        max_objects=8, seed=31, size_range=(1.0 / 24.0, 1.0 / 3.0),
        crowd_prob=0.15, image_sizes=COCO_TYPICAL_SIZES)
    return cfg, ds


def gate_torchref_mid():
    """The MID-confidence parity regime (VERDICT r4 next #4): a
    generalizing gate model evaluated on the mixed-geometry held-out JPEG
    set — the val2017-like operating point (AP well inside (0.05, 0.95),
    confident and marginal detections mixed) — through the production
    variable-geometry evaluator vs the torch replica. Completes the
    three-regime table: train-set (overfit) / mid / junk."""
    from detjax.utils.torch_import import export_full_detector

    # floor 0.15, not 0.3: with 256 distinct scenes memorization is
    # limited, so TRAIN-set AP sits near held-out AP — the real
    # operating-point assert is the held-out 0.05 < AP < 0.95 below.
    cfg, _, variables = _trained_once(
        _MID_TRAINED, _mid_setup, 6000, "torchref-mid", 0.15,
        "mid_trained.msgpack")
    stages = (3, 4, 6, 3)
    k = cfg.model.num_classes
    sd = export_full_detector(variables["params"], variables["batch_stats"],
                              depth=cfg.model.backbone_depth)

    # held-out mixed-geometry scenes from the SAME distribution (fresh
    # seed) — the regime where a generalizing model detects at mid scores
    ds_map, img_dir = _mixed_jpeg_dataset(
        "mid_val", num_images=24, num_classes=12, max_objects=8,
        seed=222, size_range=(1.0 / 24.0, 1.0 / 3.0), crowd_prob=0.15,
        image_sizes=COCO_TYPICAL_SIZES)
    fp32_proto, proto_cfg = _proto_cfgs(cfg)
    torch_eval = _torch_eval_jpeg(sd, img_dir, stages, k, cfg)

    payload = _two_stack_map(
        variables, ds_map, "mid-confidence held-out 24 img (real JPEG)",
        k, fp32_proto, proto_cfg, torch_eval, use_protocol=True)
    ap = payload["torchref"]["AP"]
    assert 0.05 < ap < 0.95, (
        f"mid regime missed the operating point: torch-replica AP {ap:.4f}"
        " — adjust _mid_setup (train scenes / steps) so held-out AP is "
        "genuinely mid-range")
    _record("torchref-mid", "two_stack_map", payload)
    _flush_evidence()
    print(f"TORCHREF-MID GATE PASSED (held-out AP {ap:.4f})")


_R101_TRAINED = {}


def _r101_setup():
    """Flagship-depth (config 4) torchref workload: _hard_setup at
    backbone depth 101."""
    cfg, ds = _hard_setup()
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone_depth=101))
    return cfg, ds


def gate_torchref_r101():
    """Torch reference-replica parity at R101 depth (VERDICT r4 next #3 —
    benchmark config 4's flagship backbone): detect differential (fp32
    both stacks + production bf16), per-image training-loss-loop
    differential, and two-stack mAP in two regimes — train-set (pinned
    608 geometry, same reasoning as gate_torchref) and mixed-geometry
    held-out real-JPEG through the production protocol evaluator.
    eval_branch.detector_forward_t is depth-generic (stage_sizes
    (3,4,23,3))."""
    import dataclasses
    import time

    import jax.numpy as jnp

    from detjax.data.pipeline import make_eval_iterator
    from detjax.data.transforms import pad_annotations
    from detjax.modeling import anchor_config, detect_u8
    from detjax.models.detector import build_detector
    from detjax.ops.anchors import anchors_for_shape
    from detjax.ops.losses import detection_loss
    from detjax.utils.torch_import import export_full_detector
    from tests.torch_ref.eval_branch import (
        detector_forward_t, loss_loop_t, normalize_t, postprocess_t)

    cfg, ds, variables = _trained_once(
        _R101_TRAINED, _r101_setup, 2500, "torchref-r101", 0.5,
        "r101_trained.msgpack")
    stages = (3, 4, 23, 3)
    k = cfg.model.num_classes
    sd = export_full_detector(variables["params"], variables["batch_stats"],
                              depth=101)

    # ---- (a) detect differential at 640: identical canvases, fp32 both
    # stacks, production-bf16 cross-check
    fp32_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype="float32"))
    batch = next(iter(make_eval_iterator(ds, cfg)))
    canvases = np.asarray(batch["images"])[:2]
    with jax.default_matmul_precision("highest"):
        det = detect_u8(variables, canvases, fp32_cfg)
    det16 = detect_u8(variables, canvases, cfg)
    t0 = time.time()
    x_nchw = normalize_t(canvases, cfg.data.mean, cfg.data.std)
    t_cls, t_reg = detector_forward_t(sd, x_nchw, stages, k)
    print(f"torch replica R101 forward ×{len(canvases)} @640: "
          f"{time.time() - t0:.1f}s")
    t_dets = [postprocess_t(
        t_cls[i], t_reg[i], cfg.model.image_size,
        score_threshold=cfg.eval.score_threshold,
        iou_threshold=cfg.eval.nms_iou_threshold,
        max_detections=cfg.eval.max_detections)
        for i in range(len(canvases))]
    _record("torchref-r101", "detect_differential",
            _diff_detections(det, det16, t_dets))

    # ---- (c) training-loss differential: vectorized vs per-image loop
    nb = 4
    imgs, gtb, gtl = [], [], []
    for i in range(nb):
        rec = ds[i]
        b, l = pad_annotations(rec["boxes"], rec["labels"], cfg.train.max_gt)
        imgs.append(rec["image"])
        gtb.append(b)
        gtl.append(l)
    x = normalize_t(np.stack(imgs), cfg.data.mean, cfg.data.std)
    x_nhwc = np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))
    gtb, gtl = np.stack(gtb), np.stack(gtl)
    module = build_detector(fp32_cfg.model)
    cls, reg = module.apply(variables, jnp.asarray(x_nhwc), train=False)
    anchors = jnp.asarray(
        anchors_for_shape(cfg.model.image_size, anchor_config(cfg)))
    out = detection_loss(
        cls, reg, anchors, jnp.asarray(gtb), jnp.asarray(gtl),
        fg_iou_threshold=cfg.train.fg_iou_threshold,
        bg_iou_threshold=cfg.train.bg_iou_threshold,
        alpha=cfg.train.focal_alpha, gamma=cfg.train.focal_gamma,
        beta=cfg.train.smooth_l1_beta, box_std=cfg.model.box_std)
    t0 = time.time()
    t_cl, t_rl = loss_loop_t(
        sd, x_nhwc, gtb, gtl, stages, k,
        fg=cfg.train.fg_iou_threshold, bg=cfg.train.bg_iou_threshold,
        alpha=cfg.train.focal_alpha, gamma=cfg.train.focal_gamma,
        beta=cfg.train.smooth_l1_beta)
    j_cl, j_rl = float(out.cls_loss), float(out.reg_loss)
    print(f"R101 loss differential (bs={nb} @640, torch loop "
          f"{time.time() - t0:.0f}s): cls {j_cl:.6f} vs {t_cl:.6f}, "
          f"reg {j_rl:.6f} vs {t_rl:.6f}")
    assert abs(j_cl - t_cl) <= max(2e-3 * abs(t_cl), 2e-5), (j_cl, t_cl)
    assert abs(j_rl - t_rl) <= max(2e-3 * abs(t_rl), 2e-5), (j_rl, t_rl)
    _record("torchref-r101", "loss_differential",
            {"detjax": [j_cl, j_rl], "torchref": [float(t_cl), float(t_rl)]})
    _flush_evidence()

    # ---- (b) two-stack mAP, two regimes: train-set at the pinned 608
    # geometry (640 sources — canvas coincides, same reasoning as
    # gate_torchref) and mixed-geometry held-out real JPEGs through the
    # production variable-geometry evaluator.
    from tests.torch_ref.eval_branch import eval_branch_t

    pin_cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=(608, 608)),
        data=dataclasses.replace(cfg.data, eval_scale_minmax=(608, 1024)))
    pin_fp32 = dataclasses.replace(
        pin_cfg, model=dataclasses.replace(pin_cfg.model, dtype="float32"))

    def torch_eval_pin(rec):
        return eval_branch_t(
            sd, rec["image"], stages, k,
            mean=cfg.data.mean, std=cfg.data.std,
            score_threshold=cfg.eval.score_threshold,
            iou_threshold=cfg.eval.nms_iou_threshold,
            max_detections=cfg.eval.max_detections)

    _record("torchref-r101", "two_stack_map[train-set]",
            _two_stack_map(variables, ds, "r101 train-set 16 img", k,
                           pin_fp32, pin_cfg, torch_eval_pin))
    _flush_evidence()

    ds_map, img_dir = _mixed_jpeg_dataset(
        "r101_val", num_images=12, num_classes=80, max_objects=8,
        seed=321, size_range=(1.0 / 32.0, 1.0 / 3.0), crowd_prob=0.15,
        image_sizes=COCO_TYPICAL_SIZES)
    fp32_proto, proto_cfg = _proto_cfgs(cfg)
    torch_eval = _torch_eval_jpeg(sd, img_dir, stages, k, cfg)
    _record("torchref-r101", "two_stack_map[mixed]",
            _two_stack_map(variables, ds_map,
                           "r101 mixed-geometry held-out 12 img (real JPEG)",
                           k, fp32_proto, proto_cfg, torch_eval,
                           use_protocol=True))
    _flush_evidence()
    print("TORCHREF-R101 GATE PASSED")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", default="all",
                    choices=("quick", "hard", "ssd", "int8", "export",
                             "hard-int8", "hard-export", "hard-all",
                             "torchref", "torchref-ssd", "torchref-mixed",
                             "torchref-mid", "torchref-r101",
                             "r101-multiscale", "all"))
    args = ap.parse_args()
    gates = {"quick": [gate_quick], "hard": [gate_hard],
             "ssd": [gate_ssd], "int8": [gate_int8],
             "export": [gate_export],
             "hard-int8": [gate_hard_int8],
             "hard-export": [gate_hard_export],
             "torchref": [gate_torchref],
             "torchref-ssd": [gate_torchref_ssd],
             "torchref-mixed": [gate_torchref_mixed],
             "torchref-mid": [gate_torchref_mid],
             "torchref-r101": [gate_torchref_r101],
             "r101-multiscale": [gate_r101_multiscale],
             # the flagship-scale gates share ONE trained model
             "hard-all": [gate_hard, gate_hard_int8, gate_hard_export,
                          gate_torchref, gate_torchref_mixed],
             "all": [gate_quick, gate_hard, gate_ssd, gate_int8,
                     gate_export, gate_hard_int8, gate_hard_export,
                     gate_torchref, gate_torchref_ssd, gate_torchref_mixed,
                     gate_torchref_mid, gate_torchref_r101,
                     gate_r101_multiscale]
             }[args.gate]
    try:
        for g in gates:
            g()
    finally:
        _flush_evidence()
    print("E2E GATE PASSED")
