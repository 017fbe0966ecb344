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

import numpy as np
import jax

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset, make_train_iterator
from detjax.evaluation.evaluator import run_coco_eval
from detjax.train import fit


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
    """Train the quick-gate model ONCE per process (deterministic workload
    — same reasoning as _hard_trained)."""
    cfg, ds = _quick_setup()
    if "v" not in _QUICK_TRAINED:
        _QUICK_TRAINED["v"] = _run(cfg, ds, 1500, name, 0.6)
    else:
        print(f"{name}: reusing the trained quick-gate model "
              f"(deterministic workload)")
    return cfg, ds, _QUICK_TRAINED["v"]


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
    """Train the flagship-scale gate model ONCE per process and share it
    across the hard gates: the workload is fully deterministic (seeded
    synthetic data, seeded init, fixed steps), so hard/hard-int8/
    hard-export would each retrain the IDENTICAL model — ~2500 steps of
    640px/bs8 chip time apiece. The AP50 assert runs on the first train;
    reuses are labeled.

    DETJAX_GATE_CACHE=<dir> additionally persists the trained variables
    across PROCESSES (msgpack via flax.serialization): iterating on a
    gate's verification section then costs seconds, not the 2500-step
    train. Sound because the workload is deterministic — the cached
    model is byte-for-byte the one a retrain would produce. Off by
    default; the AP50 assert only runs on a real train."""
    import os

    cfg, ds = _hard_setup()
    if "v" not in _HARD_TRAINED:
        cache_dir = os.environ.get("DETJAX_GATE_CACHE")
        path = (os.path.join(cache_dir, "hard_trained.msgpack")
                if cache_dir else None)
        if path and os.path.exists(path):
            import flax.serialization as fser

            from detjax.modeling import build_model

            _, target = build_model(cfg)
            with open(path, "rb") as f:
                _HARD_TRAINED["v"] = fser.from_bytes(target, f.read())
            print(f"{name}: loaded the trained hard-gate model from {path}")
        else:
            _HARD_TRAINED["v"] = _run(cfg, ds, 2500, name, 0.5)
            if path:
                import flax.serialization as fser

                os.makedirs(cache_dir, exist_ok=True)
                with open(path, "wb") as f:
                    f.write(fser.to_bytes(_HARD_TRAINED["v"]))
                print(f"{name}: cached the trained model to {path}")
    else:
        print(f"{name}: reusing the trained hard-gate model "
              f"(deterministic workload)")
    return cfg, ds, _HARD_TRAINED["v"]


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
    """Train the SSD gate model ONCE per process (deterministic workload);
    DETJAX_GATE_CACHE persists it across processes — same mechanism and
    soundness argument as _hard_trained."""
    import os

    cfg, ds = _ssd_setup()
    if "v" not in _SSD_TRAINED:
        cache_dir = os.environ.get("DETJAX_GATE_CACHE")
        path = (os.path.join(cache_dir, "ssd_trained.msgpack")
                if cache_dir else None)
        if path and os.path.exists(path):
            import flax.serialization as fser

            from detjax.modeling import build_model

            _, target = build_model(cfg)
            with open(path, "rb") as f:
                _SSD_TRAINED["v"] = fser.from_bytes(target, f.read())
            print(f"{name}: loaded the trained ssd-gate model from {path}")
        else:
            _SSD_TRAINED["v"] = _run(cfg, ds, 1500, name, 0.5)
            if path:
                import flax.serialization as fser

                os.makedirs(cache_dir, exist_ok=True)
                with open(path, "wb") as f:
                    f.write(fser.to_bytes(_SSD_TRAINED["v"]))
                print(f"{name}: cached the trained model to {path}")
    else:
        print(f"{name}: reusing the trained ssd-gate model "
              f"(deterministic workload)")
    return cfg, ds, _SSD_TRAINED["v"]


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


def _quantize_on_eval_stream(variables, ds, cfg):
    """Calibrate PTQ activation ranges on the first (normalized) eval
    batch — the gates' calibration protocol."""
    import jax.numpy as jnp

    from detjax import quant
    from detjax.data.pipeline import device_augment, make_eval_iterator

    batch = next(iter(make_eval_iterator(ds, cfg)))
    imgs = jnp.asarray(batch["images"])
    if imgs.dtype == jnp.uint8:
        imgs, _ = device_augment(
            imgs, jnp.zeros((imgs.shape[0], 1, 4), jnp.float32),
            jax.random.PRNGKey(0), hflip_prob=0.0,
            mean=cfg.data.mean, std=cfg.data.std)
    return quant.quantize_model(variables, cfg, imgs)


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


def _two_stack_map(variables, ds_map, regime, num_classes, fp32_proto,
                   proto_cfg, torch_eval):
    """Two-stack COCO mAP comparison for one val regime: detjax runs its
    production pipeline (fp32-highest + production-bf16 legs), the torch
    replica runs ``torch_eval(rec) -> (boxes, scores, labels)`` per raw
    image; all 12 COCOeval stats are diffed and asserted."""
    import time

    from detjax.evaluation.coco_map import COCOMetric
    from detjax.evaluation.evaluator import _gt_provider

    with jax.default_matmul_precision("highest"):
        ev_jax = run_coco_eval(variables, ds_map, fp32_proto)
    ev_jax16 = run_coco_eval(variables, ds_map, proto_cfg)

    gt_of = _gt_provider(ds_map)
    metric = COCOMetric(category_ids=list(range(num_classes)))
    t0 = time.time()
    for i in range(len(ds_map)):
        rec = ds_map[i]
        tb, ts, tl = torch_eval(rec)
        metric.add(rec["image_id"], gt_of(rec["image_id"]), tb, ts, tl)
        print(f"  torch stack [{regime}] {i + 1}/{len(ds_map)} "
              f"({time.time() - t0:.0f}s)", flush=True)
    ev_torch = metric.compute()

    print(f"[{regime}]")
    print(f"{'stat':>6} {'detjax':>8} {'det-bf16':>9} {'torchref':>9} "
          f"{'delta':>8} {'d-bf16':>8}")
    worst, worst16 = 0.0, 0.0
    for key in ev_jax.stats:
        d = ev_jax.stats[key] - ev_torch.stats[key]
        d16 = ev_jax16.stats[key] - ev_torch.stats[key]
        worst = max(worst, abs(d))
        worst16 = max(worst16, abs(d16))
        print(f"{key:>6} {ev_jax.stats[key]:8.4f} "
              f"{ev_jax16.stats[key]:9.4f} "
              f"{ev_torch.stats[key]:9.4f} {d:+8.4f} {d16:+8.4f}")
    assert worst <= 0.002, (
        f"two-stack mAP parity FAILED [{regime}]: worst |Δ| "
        f"{worst:.4f} > 0.002 (the north star's ±0.2 mAP points)")
    assert worst16 <= 0.01, (
        f"production-bf16 mAP drift {worst16:.4f} > 0.01 [{regime}] — "
        "bf16 box drift should only flip IoU>=0.9 matches")
    print(f"two-stack mAP parity [{regime}]: worst |Δ| {worst:.4f} "
          f"<= 0.002 on all 12 stats (production bf16: "
          f"{worst16:.4f} <= 0.01)")


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

    for ds_map, regime in ((ds, "train-set 16 img"),
                           (ds_val, "held-out 64 img")):
        _two_stack_map(variables, ds_map, regime, k, fp32_proto, proto_cfg,
                       torch_eval)
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
        _two_stack_map(variables, ds_map, regime, k, fp32_proto, cfg,
                       torch_eval)
    print("TORCHREF-SSD GATE PASSED")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", default="all",
                    choices=("quick", "hard", "ssd", "int8", "export",
                             "hard-int8", "hard-export", "hard-all",
                             "torchref", "torchref-ssd", "r101-multiscale",
                             "all"))
    args = ap.parse_args()
    gates = {"quick": [gate_quick], "hard": [gate_hard],
             "ssd": [gate_ssd], "int8": [gate_int8],
             "export": [gate_export],
             "hard-int8": [gate_hard_int8],
             "hard-export": [gate_hard_export],
             "torchref": [gate_torchref],
             "torchref-ssd": [gate_torchref_ssd],
             "r101-multiscale": [gate_r101_multiscale],
             # the flagship-scale gates share ONE trained model
             "hard-all": [gate_hard, gate_hard_int8, gate_hard_export,
                          gate_torchref],
             "all": [gate_quick, gate_hard, gate_ssd, gate_int8,
                     gate_export, gate_hard_int8, gate_hard_export,
                     gate_torchref, gate_torchref_ssd,
                     gate_r101_multiscale]
             }[args.gate]
    for g in gates:
        g()
    print("E2E GATE PASSED")
