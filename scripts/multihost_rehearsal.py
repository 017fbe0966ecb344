#!/usr/bin/env python
"""Two-process multi-host DP rehearsal (VERDICT r1 #6, extended per
VERDICT r2 #5 to checkpoint/resume/eval).

Runs ``jax.distributed.initialize`` with 2 CPU processes × 4 fake devices
each (the single-box stand-in for 2 TPU hosts of a v5e pod slice) and
exercises the REAL multi-host path end-to-end, in three phased process
generations:

  phase "straight": 2 procs train STEPS_TOTAL steps, print state digest
                    (the ground truth for bit-exact resume).
  phase "train":    fresh 2 procs train SAVE_AT steps, save via Orbax
                    under jax.distributed (coordinated multi-process
                    commit), exit — the "kill".
  phase "resume":   fresh 2 procs ("restart") restore the checkpoint with
                    a mesh-sharded template, seek the per-host data
                    stream, train the remaining steps, print digest, and
                    proc 0 runs one periodic COCO eval pass on the
                    restored weights (eval-on-primary strategy) while
                    proc 1 waits at a cross-host barrier.
  phase "spatial":  fresh 2 procs train STEPS_TOTAL steps on the 2-D
                    ``(data=4, space=2)`` mesh — image rows sharded over
                    'space', so GSPMD's conv halo exchanges run over the
                    REAL cross-process transport (Gloo here, ICI on TPU).
                    Cross-process digests must still agree bit-for-bit.

The driver asserts: cross-process bit-identical losses/params in every
phase, straight-run digest == save/kill/restart/resume digest
(bit-exact multi-host resume, SURVEY.md §5.3/§5.4), and a finite eval
stats line.

Usage:  python scripts/multihost_rehearsal.py            # spawns phases
        python scripts/multihost_rehearsal.py --worker I --phase P  # internal
"""

from __future__ import annotations

import argparse
import hashlib
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 4
STEPS_TOTAL = 5
SAVE_AT = 3


def _digest(state) -> str:
    """MD5 over every param/batch_stats/opt leaf (host-fetched) + the step
    counter — the bit-exactness fingerprint. batch_stats is in the hash so
    a restore defect in the BN-statistics subtree can't slip past the
    save/kill/restart gate."""
    import numpy as np
    import jax

    h = hashlib.md5()
    for leaf in (jax.tree.leaves(state.params)
                 + jax.tree.leaves(state.batch_stats)
                 + jax.tree.leaves(state.opt_state)):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    h.update(str(int(np.asarray(state.step))).encode())
    return h.hexdigest()


def worker(pid: int, phase: str, ckpt_dir: str, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: 3 process generations × 2 procs on a
    # single-core box — recompiling the step each time dominates otherwise
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=N_PROC,
                               process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils

    from detjax.config import get_config
    from detjax.data import SyntheticDetectionDataset
    from detjax.data.pipeline import make_train_iterator
    from detjax.parallel import (global_batch_from_local, make_mesh,
                                 make_parallel_train_step,
                                 parallel_train_state)
    from detjax.train.checkpoint import Checkpointer
    from detjax.train.step import make_train_state

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES  # global view
    cfg = get_config("coco_v5e8", **{
        "model.image_size": (64, 64), "model.num_classes": 4,
        "train.batch_size": 8, "train.max_gt": 4})
    ds = SyntheticDetectionDataset(num_images=32, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    # "spatial" rides the 2-D (data=4, space=2) mesh: conv halo exchanges
    # cross the process boundary (data groups 0-1 on proc 0, 2-3 on proc 1;
    # each group's space pair is process-local here, but the gradient
    # all-reduce over 'data' and the resharding collectives are cross-host)
    mesh = make_mesh(spatial=2 if phase == "spatial" else 1)
    state = parallel_train_state(
        make_train_state(cfg, jax.random.PRNGKey(0)), mesh)
    step = make_parallel_train_step(cfg, mesh)
    train_iter = make_train_iterator(ds, cfg, per_host=True)

    # AOT-compile the step BEFORE the first collective executes, then
    # rendezvous on the coordination service (gRPC): on a single-core box
    # the two procs' compiles serialize minutes apart, and Gloo's pair
    # CONNECT timeout fires if one side reaches the first all-reduce that
    # much earlier. Dummy batch = exact shapes/dtypes of the real stream.
    per_host_bs = cfg.train.batch_size // N_PROC
    g = cfg.train.max_gt
    dummy = global_batch_from_local(
        {"images": np.zeros((per_host_bs, 64, 64, 3), np.uint8),
         "gt_boxes": np.zeros((per_host_bs, g, 4), np.float32),
         "gt_labels": np.full((per_host_bs, g), -1, np.int32)}, mesh)
    step.warmup(state, dummy)
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(
        f"compiled_{phase}", timeout_in_ms=1_200_000)

    def run_steps(state, start: int, n: int, losses: list):
        # per_host=True → this process loads ONLY its stride of the
        # shuffle and its slice of the global batch; iter_from seeks the
        # stream to the resume point (bit-exact data continuation)
        it = train_iter.iter_from(start) if start else iter(train_iter)
        for _ in range(n):
            local = next(it)
            batch = global_batch_from_local(
                {k: v for k, v in local.items()
                 if k in ("images", "gt_boxes", "gt_labels")}, mesh)
            assert batch["images"].shape[0] == cfg.train.batch_size
            state, metrics = step(state, batch)
            # loss is replicated: every host's devices hold it → the
            # printed values must agree across processes bit-for-bit
            losses.append(float(np.asarray(metrics["loss"])))
        return state

    losses: list = []
    if phase in ("straight", "spatial"):
        state = run_steps(state, 0, STEPS_TOTAL, losses)
    elif phase == "train":
        state = run_steps(state, 0, SAVE_AT, losses)
        ckpt = Checkpointer(ckpt_dir)
        ckpt.save(state, wait=True, host={"marker": 1.0})
        assert ckpt.latest_step() == SAVE_AT
    elif phase == "resume":
        ckpt = Checkpointer(ckpt_dir)
        # restore with the mesh-placed template: the sharded abstract tree
        # tells Orbax the global placement (multi-process restore)
        state, host = ckpt.restore(state, host_template={"marker": 0.0})
        assert int(np.asarray(state.step)) == SAVE_AT, state.step
        assert host["marker"] == 1.0, host
        state = run_steps(state, SAVE_AT, STEPS_TOTAL - SAVE_AT, losses)
        # one periodic-eval pass on the resumed weights: eval-on-primary
        # (proc 0 evaluates, others wait at the barrier — the multihost
        # periodic-eval strategy of the train loop)
        if pid == 0:
            from detjax.evaluation import run_coco_eval

            variables = {
                "params": jax.tree.map(np.asarray, state.params),
                "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}
            res = run_coco_eval(variables, ds, cfg, max_images=8)
            stats = {k: float(v) for k, v in list(res.stats.items())[:3]}
            assert all(np.isfinite(list(stats.values()))), stats
            print(f"[proc {pid}] eval {stats}", flush=True)
        multihost_utils.sync_global_devices("rehearsal_eval_done")
    else:
        raise ValueError(phase)

    print(f"[proc {pid}] phase={phase} "
          f"losses={['%.6f' % l for l in losses]} "
          f"digest={_digest(state)}", flush=True)
    assert all(np.isfinite(losses))
    # rendezvous before shutdown: on a single-core box the two processes
    # can be minutes apart (compile skew), and the leader's shutdown
    # barrier timing out tears the coordination service from under the
    # laggard. The explicit barrier has a generous timeout; shutdown
    # flakiness after every assert has passed must not fail the phase.
    multihost_utils.sync_global_devices(f"rehearsal_{phase}_done")
    try:
        jax.distributed.shutdown()
    except Exception as e:
        print(f"[proc {pid}] shutdown warning: {e!r}", flush=True)


def _spawn(phase: str, ckpt_dir: str, port: int):
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         "--phase", phase, "--ckpt-dir", ckpt_dir, "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)]
    outs = [p.communicate()[0] for p in procs]
    codes = [p.returncode for p in procs]
    for i, out in enumerate(outs):
        tail = "\n".join(out.strip().splitlines()[-8:])
        print(f"--- {phase} proc {i} (exit {codes[i]}) ---\n{tail}",
              flush=True)
    assert codes == [0] * N_PROC, f"{phase}: exits {codes}"
    lines = [next(l for l in out.splitlines()
                  if l.startswith(f"[proc {i}] phase={phase}"))
             for i, out in enumerate(outs)]
    payload = [l.split("]", 1)[1] for l in lines]
    # both processes must agree bit-for-bit on losses and state digest
    assert payload[0] == payload[1], \
        f"cross-host mismatch in {phase}:\n{payload[0]}\n{payload[1]}"
    return payload[0], outs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--phase", default="straight")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.phase, args.ckpt_dir, args.port)
        return

    ckpt_dir = args.ckpt_dir or tempfile.mkdtemp(prefix="mh_rehearsal_")
    # fresh port per driver run: a stale coordinator from an aborted
    # earlier run must not capture the new process generations
    port = args.port or (9700 + os.getpid() % 250)
    straight, _ = _spawn("straight", ckpt_dir, port)
    _spawn("train", ckpt_dir, port)  # saves at SAVE_AT, then "killed" (exits)
    resumed, outs = _spawn("resume", ckpt_dir, port)  # fresh procs = restart
    spatial, _ = _spawn("spatial", ckpt_dir, port)  # DP×SP 2-D mesh

    d_straight = straight.split("digest=")[1].strip()
    d_resumed = resumed.split("digest=")[1].strip()
    assert d_straight == d_resumed, (
        f"resume NOT bit-exact: straight {d_straight} vs resumed "
        f"{d_resumed}")
    assert any("eval {" in o for o in outs[0].splitlines()), \
        "no periodic-eval line from proc 0"
    assert "digest=" in spatial  # cross-proc equality asserted in _spawn
    print(f"multihost rehearsal v2 OK: {N_PROC} processes × "
          f"{LOCAL_DEVICES} devices, train {STEPS_TOTAL} straight == "
          f"train {SAVE_AT} + Orbax save + restart + resume "
          f"{STEPS_TOTAL - SAVE_AT} (digest {d_straight[:12]}…), "
          "periodic eval on resumed weights passed, "
          "spatial (data=4, space=2) phase cross-process bit-identical")


if __name__ == "__main__":
    main()
