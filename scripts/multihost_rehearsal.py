#!/usr/bin/env python
"""Two-process multi-host DP rehearsal (VERDICT round-1 next-step #6).

Runs ``jax.distributed.initialize`` with 2 CPU processes × 4 fake devices
each (the single-box stand-in for 2 TPU hosts of a v5e pod slice) and
exercises the REAL multi-host path end-to-end:

  per-host sharded DetectionIterator (disjoint strides of one shuffle)
  → global_batch_from_local (jax.make_array_from_process_local_data)
  → pjit DP train step over the 8-device global mesh
  → cross-host agreement on the (replicated) loss and params.

Usage:  python scripts/multihost_rehearsal.py            # spawns 2 procs
        python scripts/multihost_rehearsal.py --worker I # internal
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 9763
N_PROC = 2
LOCAL_DEVICES = 4
STEPS = 3


def worker(pid: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{PORT}", num_processes=N_PROC,
                               process_id=pid)
    import numpy as np

    from detjax.config import get_config
    from detjax.data import SyntheticDetectionDataset
    from detjax.data.pipeline import make_train_iterator
    from detjax.parallel import (global_batch_from_local, make_mesh,
                                 make_parallel_train_step,
                                 parallel_train_state)
    from detjax.train.step import make_train_state

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES  # global view
    cfg = get_config("coco_v5e8", **{
        "model.image_size": (64, 64), "model.num_classes": 4,
        "train.batch_size": 8, "train.max_gt": 4})
    ds = SyntheticDetectionDataset(num_images=32, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    # per_host=True → this process loads ONLY its stride of the shuffle
    # and its train.batch_size // process_count slice of the global batch
    it = iter(make_train_iterator(ds, cfg, per_host=True))

    mesh = make_mesh()  # all 8 global devices
    state = parallel_train_state(
        make_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_parallel_train_step(cfg, mesh)

    losses = []
    for _ in range(STEPS):
        local = next(it)
        batch = global_batch_from_local(
            {k: v for k, v in local.items()
             if k in ("images", "gt_boxes", "gt_labels")}, mesh)
        assert batch["images"].shape[0] == cfg.train.batch_size  # global
        state, metrics = step(state, batch)
        # loss is replicated: every host's devices hold it → host-local
        # fetch, and the printed values must agree across processes
        losses.append(float(np.asarray(metrics["loss"])))
    p0 = float(np.asarray(jax.tree.leaves(state.params)[0]).reshape(-1)[0])
    print(f"[proc {pid}] losses={['%.6f' % l for l in losses]} "
          f"param0={p0:.8f}", flush=True)
    assert all(np.isfinite(losses))
    jax.distributed.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker)
        return
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)]
    outs = [p.communicate()[0] for p in procs]
    codes = [p.returncode for p in procs]
    for i, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- proc {i} (exit {codes[i]}) ---\n{tail}")
    # both processes must agree bit-for-bit on loss and params
    lines = [next(l for l in out.splitlines() if l.startswith(f"[proc {i}]"))
             for i, out in enumerate(outs)]
    a, b = (l.split("]", 1)[1] for l in lines)
    assert a == b, f"cross-host mismatch:\n{a}\n{b}"
    assert codes == [0] * N_PROC, codes
    print("multihost rehearsal OK: 2 processes, 8 global devices, "
          f"{STEPS} steps, bit-identical replicated state")


if __name__ == "__main__":
    main()
