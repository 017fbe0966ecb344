"""Training orchestration (SURVEY.md §2 #16, §3.1; benchmark config 5).

The reference's ``train.py main()`` — epoch loop, Adam(1e-5),
``ReduceLROnPlateau``, grad-clip 0.1, per-epoch ``torch.save``, per-epoch
COCO eval — becomes a step-based loop around ONE jitted (optionally pjit
data-parallel) train step:

  * host work per step is only: next prefetched batch + metrics bookkeeping
    (the step itself runs async on device; we sync once per log interval)
  * ReduceLROnPlateau semantics are reproduced host-side by writing the new
    lr into opt_state (``inject_hyperparams`` array) — zero recompiles
  * periodic Orbax checkpoints (async) + periodic COCO mAP eval
  * throughput (images/sec/chip) tracked continuously
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from detjax.config import Config
from detjax.train.step import (
    TrainState,
    get_learning_rate,
    make_train_state,
    make_train_step,
    set_learning_rate,
)
from detjax.utils.logging import MetricsLogger
from detjax.utils.profiling import StepTimer


class ReduceLROnPlateau:
    """Host-side mirror of torch.optim.lr_scheduler.ReduceLROnPlateau
    (mode='min', relative threshold), the reference's scheduler."""

    def __init__(self, factor: float = 0.1, patience: int = 3,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def update(self, value: float, current_lr: float) -> Optional[float]:
        """Feed a monitored value; returns the new lr if it should drop."""
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
            return None
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            new_lr = max(current_lr * self.factor, self.min_lr)
            if new_lr < current_lr:
                return new_lr
        return None


@dataclasses.dataclass
class FitResult:
    state: TrainState
    history: list
    images_per_sec: float


def fit(
    cfg: Config,
    train_batches: Iterable[Dict[str, np.ndarray]],
    num_steps: int,
    state: Optional[TrainState] = None,
    eval_dataset: Any = None,
    eval_max_images: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    log_dir: Optional[str] = None,
    log_every: int = 50,
    tensorboard: bool = False,
    lr_plateau_every: int = 500,
    mesh=None,
    resume: bool = True,
) -> FitResult:
    """Run ``num_steps`` optimization steps; returns final state + history.

    ``train_batches`` yields numpy batches (see DetectionIterator). When
    ``mesh`` is given the step is the pjit data-parallel one (config 5).
    """
    from detjax.train.checkpoint import Checkpointer

    if state is None:
        state = make_train_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    plateau = ReduceLROnPlateau() if cfg.train.lr_schedule == "plateau" else None
    # partial plateau window (sum/count of per-step losses since the last
    # plateau decision) — checkpointed so resume is bit-exact (SURVEY.md §5.4)
    window_sum, window_n = 0.0, 0
    ckpt = Checkpointer(checkpoint_dir) if checkpoint_dir else None
    if ckpt is not None and resume and ckpt.latest_step() is not None:
        host_template = {"plateau_best": np.inf, "plateau_num_bad": 0,
                         "window_sum": 0.0, "window_n": 0}
        state, host = ckpt.restore(state, host_template=host_template)
        if plateau is not None:
            plateau.best = float(host["plateau_best"])
            plateau.num_bad = int(host["plateau_num_bad"])
        window_sum, window_n = float(host["window_sum"]), int(host["window_n"])
        print(f"[fit] resumed from step {int(np.asarray(state.step))}")

    if mesh is not None:
        from detjax.parallel import make_parallel_train_step, parallel_train_state

        state = parallel_train_state(state, mesh)
        step_fn = make_parallel_train_step(cfg, mesh)
    else:
        step_fn = make_train_step(cfg)

    logger = MetricsLogger(log_dir, print_every=log_every,
                           tensorboard=tensorboard)
    timer = StepTimer(skip=2)
    # Transfer-leak guard for the axon tunnel backend: its PJRT client
    # retains EVERY host→device argument buffer for the life of the cached
    # executable (measured: +9.45 MB/step at bs=8 @640 — exactly the uint8
    # batch; explicit device_put + .delete() leaks MORE, +23 MB/step), so
    # any long training OOMs the host (a 9000-step gate run grew to 130 GB
    # and was OOM-killed). jax.clear_caches() provably frees it; with the
    # persistent compile cache the retrace+program-reload costs ~48 s, so
    # a purge every 2500 steps bounds retention at ~24 GB for ~2% wall
    # overhead. Real TPU PJRT does not leak — the guard self-enables only
    # on the 'axon' backend (train.leak_guard_every overrides; 0 = auto).
    history = []
    pending: list = []  # device loss scalars; sync deferred until folded
    start = int(np.asarray(state.step))
    t = cfg.train
    guard_every = t.leak_guard_every
    if guard_every == 0 and jax.default_backend() == "axon":
        guard_every = 2500
    guard_every = max(guard_every, 0)  # -1 = force off

    def fold_window():
        """Fold pending device losses into the host (sum, n) accumulators."""
        nonlocal window_sum, window_n, pending
        if pending:
            import jax.numpy as jnp

            window_sum += float(np.asarray(jnp.stack(pending).sum()))
            window_n += len(pending)
            pending = []

    def host_state():
        return {"plateau_best": plateau.best if plateau else np.inf,
                "plateau_num_bad": plateau.num_bad if plateau else 0,
                "window_sum": window_sum, "window_n": window_n}

    # resume the data stream at the same global batch (bit-exact resume):
    # step counter == batch index for seekable iterators
    if start > 0 and hasattr(train_batches, "iter_from"):
        it = train_batches.iter_from(start)
    else:
        it = iter(train_batches)
    # double-buffered device transfer: next batch's H2D overlaps this
    # step's compute (SURVEY.md §7). Values pass through unchanged, so
    # seek/resume determinism is untouched. Multi-host feeds per-process
    # shards through global_batch_from_local instead.
    # "auto" (default): don't trust either assumption — time one real
    # batch's device_put against one compiled step during the first few
    # iterations and enable prefetch only where the transfer can actually
    # hide under compute (pipeline.prefetch_is_profitable; through this
    # box's axon tunnel prefetch measured 0.24× serial, on real TPU hosts
    # the transfer rides the DMA engine — VERDICT r3 #4).
    dp = cfg.data.device_prefetch
    sharding = None
    if mesh is not None:
        from detjax.parallel.mesh import NamedSharding, P

        sharding = NamedSharding(mesh, P("data"))
    calibrate_until = -1
    if jax.process_count() == 1:
        from detjax.data.pipeline import device_prefetch

        if dp == "auto":
            # steps [start, start+2]: unprefetched, instrumented; the
            # decision applies from start+3 on. Runs too short for the
            # calibration to pay off stay serial (the safe default).
            calibrate_until = start + 2 if num_steps - start > 4 else -1
        elif dp:
            it = device_prefetch(it, size=1, sharding=sharding)
    cal_transfer, cal_step = float("inf"), float("inf")
    for i in range(start, num_steps):
        batch = next(it)
        if start <= i <= calibrate_until:
            # calibration step: timed put + timed step, each forced via a
            # host fetch (np.asarray — the only reliable sync through the
            # axon tunnel). Step i==start also pays the compile; only the
            # later iterations' timings count.
            import time as _time

            target = sharding if sharding is not None else jax.devices()[0]
            t0 = _time.perf_counter()
            batch = {k: jax.device_put(v, target) for k, v in batch.items()}
            np.asarray(batch["images"][0, 0, 0])  # force the transfer
            t1 = _time.perf_counter()
            state, metrics = step_fn(state, batch)
            float(np.asarray(metrics["loss"]))  # force the step
            t2 = _time.perf_counter()
            if i > start:  # skip the compile iteration
                cal_transfer = min(cal_transfer, t1 - t0)
                cal_step = min(cal_step, t2 - t1)
            if i == calibrate_until:
                from detjax.data.pipeline import (device_prefetch,
                                                  prefetch_is_profitable)

                on = prefetch_is_profitable(cal_transfer, cal_step)
                print(f"[fit] device_prefetch auto: transfer "
                      f"{cal_transfer * 1e3:.1f} ms vs step "
                      f"{cal_step * 1e3:.1f} ms -> "
                      f"{'ON' if on else 'OFF (transfer cannot hide)'}")
                if on:
                    it = device_prefetch(it, size=1, sharding=sharding)
        else:
            state, metrics = step_fn(state, batch)
        timer.tick(t.batch_size)
        if plateau is not None:  # else the window is never read
            pending.append(metrics["loss"])

        if (i + 1) % log_every == 0 or i + 1 == num_steps:
            vals = {k: float(np.asarray(v)) for k, v in metrics.items()}
            vals["lr"] = get_learning_rate(state)
            vals["images_per_sec"] = round(timer.images_per_sec, 2)
            logger.log(i + 1, vals, kind="train")
            history.append({"step": i + 1, **vals})

        if plateau is not None and (i + 1) % lr_plateau_every == 0:
            fold_window()
            window = window_sum / max(window_n, 1)
            window_sum, window_n = 0.0, 0
            cur = get_learning_rate(state)
            new_lr = plateau.update(window, cur)
            if new_lr is not None:
                state = set_learning_rate(state, new_lr)
                logger.log(i + 1, {"lr": new_lr, "plateau_loss": window},
                           kind="lr")

        if guard_every and (i + 1) % guard_every == 0 and i + 1 < num_steps:
            # axon transfer-leak purge (see guard_every above). The host
            # fetch is the only reliable sync through the tunnel; live
            # arrays (state/metrics) survive clear_caches — only traces
            # and executables (and their pinned argument mirrors) drop.
            float(np.asarray(metrics["loss"]))
            jax.clear_caches()

        if ckpt is not None and (i + 1) % t.checkpoint_every_steps == 0:
            fold_window()
            ckpt.save(state, host=host_state())

        if eval_dataset is not None and (i + 1) % t.eval_every_steps == 0:
            res = _periodic_eval(state, eval_dataset, cfg, eval_max_images,
                                 mesh)
            logger.log(i + 1, res, kind="eval")
            history.append({"step": i + 1, "eval": res})

    if ckpt is not None:
        # the in-loop save may already hold this step (num_steps a multiple
        # of checkpoint_every_steps, or resume at num_steps) — orbax raises
        # StepAlreadyExistsError on a duplicate save
        if ckpt.latest_step() != int(np.asarray(state.step)):
            fold_window()
            ckpt.save(state, wait=True, host=host_state())
        else:
            ckpt.wait()
    logger.close()
    return FitResult(state=state, history=history,
                     images_per_sec=timer.images_per_sec)


def _periodic_eval(state: TrainState, dataset, cfg: Config,
                   max_images: Optional[int], mesh=None) -> Dict[str, float]:
    from detjax.evaluation.evaluator import run_coco_eval

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    # under pjit DP (config 5) the eval batch shards over the same mesh
    # as the train step; single-controller only (multi-host eval gathers
    # per-process results instead - scripts/multihost_rehearsal.py)
    import jax

    if mesh is not None and (
            jax.process_count() != 1
            or cfg.eval.batch_size % mesh.devices.size):
        # multi-host eval gathers per-process results instead; an uneven
        # batch/mesh split can't shard the leading dim — run unsharded
        # rather than kill a long training run at its first periodic eval
        mesh = None
    res = run_coco_eval(variables, dataset, cfg, max_images=max_images,
                        mesh=mesh)
    return {k: round(v, 4) for k, v in res.stats.items()}
