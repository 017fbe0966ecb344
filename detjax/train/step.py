"""Jitted training step (benchmark config 3; SURVEY.md §3.1 hot loop).

The reference's inner loop — forward, FocalLoss with a per-image Python
matching loop, backward, ``clip_grad_norm_(0.1)``, Adam(lr=1e-5) — becomes
ONE pure jitted function: matching/losses are vectorized on-device
(detjax.ops), gradient clipping and the optimizer are optax transforms
fused into the same XLA program, and buffers are donated so params update
in place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from detjax.config import Config, get_config
from detjax.models.detector import build_detector
from detjax.modeling import anchor_config, build_model
from detjax.ops.anchors import anchors_for_shape
from detjax.ops.losses import detection_loss

Array = jnp.ndarray
Batch = Dict[str, Array]  # images [B,H,W,3], gt_boxes [B,G,4], gt_labels [B,G]


class TrainState(struct.PyTreeNode):
    """Functional train state: the analog of (model, optimizer) in the
    reference's loop, as one donated PyTree."""

    step: Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    cfg: Config = struct.field(pytree_node=False)
    # EMA shadow of params (None unless cfg.train.ema_decay > 0). None is
    # a leafless pytree node, so the disabled default changes no tree
    # structure (checkpoints, donation, digests all unaffected).
    ema_params: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam(1e-5) + global-norm clip 0.1 (SURVEY.md §2 #16).

    Note the reference clips grads THEN steps Adam; optax chain order
    matches: clip first, then the optimizer update. The optimizer is wrapped
    in ``inject_hyperparams`` so the learning rate lives in opt_state as an
    ARRAY: the host-side ReduceLROnPlateau controller (loop.py, mirroring
    the reference's scheduler) updates it between steps with zero recompiles.
    """
    t = cfg.train
    if t.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(t.learning_rate, 10_000_000)
    else:  # "plateau"/"constant": base lr, host-adjustable via opt_state
        lr = t.learning_rate
    make = {
        "adam": optax.adam,
        "sgd": functools.partial(optax.sgd, momentum=0.9),
        "adamw": optax.adamw,
    }[t.optimizer]
    opt = optax.inject_hyperparams(make)(learning_rate=lr)
    return optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), opt)


def _find_hyperparams(opt_state):
    """Locate the InjectHyperparamsState inside a (possibly nested) opt_state."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = _find_hyperparams(s)
            if found is not None:
                return found
    return None


def get_learning_rate(state: "TrainState") -> float:
    hp = _find_hyperparams(state.opt_state)
    return float(np.asarray(hp.hyperparams["learning_rate"]))


def set_learning_rate(state: "TrainState", lr: float) -> "TrainState":
    """Return state with a new learning rate (no recompile: same pytree)."""

    def rewrite(s):
        if hasattr(s, "hyperparams"):
            old = s.hyperparams["learning_rate"]
            new = jnp.asarray(lr, dtype=old.dtype)
            return s._replace(hyperparams=dict(s.hyperparams, learning_rate=new))
        if isinstance(s, tuple) and not hasattr(s, "_fields"):
            return tuple(rewrite(x) for x in s)
        return s

    return state.replace(opt_state=rewrite(state.opt_state))


def make_train_state(preset, rng: Any = None, **overrides) -> TrainState:
    cfg = preset if isinstance(preset, Config) else get_config(preset, **overrides)
    module, variables = build_model(cfg, rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        cfg=cfg,
        ema_params=(jax.tree.map(jnp.copy, params)
                    if cfg.train.ema_decay > 0 else None),
    )


def ema_variables(state: TrainState):
    """Inference variables using the EMA shadow params (falls back to the
    live params when EMA is off)."""
    params = state.ema_params if state.ema_params is not None else state.params
    return {"params": params, "batch_stats": state.batch_stats}


@functools.lru_cache(maxsize=8)
def make_train_step(cfg: Config):
    """Compile-once train step for a config. Donates the state buffer."""
    module = build_detector(cfg.model)
    anchors_np = anchors_for_shape(cfg.model.image_size, anchor_config(cfg))
    t = cfg.train
    update_bn = not cfg.model.frozen_backbone_bn

    def loss_fn(params, batch_stats, batch: Batch, aug_rng):
        from detjax.data.pipeline import device_augment

        images = batch["images"]
        gt_boxes = batch["gt_boxes"]
        if images.dtype == jnp.uint8:
            # fused on-device augmentation (benchmark config 4): uint8 H2D
            # → normalize + random hflip on the VPU, inside this jit region
            images, gt_boxes = device_augment.__wrapped__(
                images, gt_boxes, aug_rng,
                hflip_prob=cfg.data.hflip_prob,
                mean=cfg.data.mean, std=cfg.data.std)
        batch = dict(batch, images=images, gt_boxes=gt_boxes)
        variables = {"params": params, "batch_stats": batch_stats}
        if update_bn:
            (cls, box), mutated = module.apply(
                variables, batch["images"], train=True,
                mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            cls, box = module.apply(variables, batch["images"], train=True)
            new_stats = batch_stats
        out = detection_loss(
            cls, box, jnp.asarray(anchors_np),
            batch["gt_boxes"], batch["gt_labels"],
            fg_iou_threshold=t.fg_iou_threshold,
            bg_iou_threshold=t.bg_iou_threshold,
            alpha=t.focal_alpha, gamma=t.focal_gamma, beta=t.smooth_l1_beta,
            box_std=cfg.model.box_std)
        return out.cls_loss + out.reg_loss, (new_stats, out.metrics)

    accum = max(int(t.grad_accum_steps), 1)

    def grads_of(params, batch_stats, batch, aug_rng):
        """(loss, new_stats, metrics, grads) over one batch — full-batch
        when accum == 1, else a lax.scan over ``accum`` equal micro-batches
        with grads summed in carry (ONE extra params-sized buffer; no
        [accum, ...] gradient stack ever materializes).

        Equivalence scope: with frozen BN the per-image loss normalization
        (ops/losses.py) makes the averaged micro-grads MATHEMATICALLY
        equal to the full-batch gradient (tested). With
        ``frozen_backbone_bn=False`` BN normalizes per micro-batch and
        running stats see ``accum`` momentum updates per step — the
        standard accumulation semantics (same as any framework's
        accumulate-over-micro-batches), not bit-equal to full-batch; and
        uint8 augmentation draws a per-micro-batch flip stream."""
        if accum == 1:
            (loss, (new_stats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, batch, aug_rng)
            return loss, new_stats, metrics, grads

        b = batch["images"].shape[0]
        if b % accum:
            raise ValueError(
                f"train.grad_accum_steps={accum} must divide the batch "
                f"size ({b})")
        micro = {k: v.reshape((accum, b // accum) + v.shape[1:])
                 for k, v in batch.items()}
        rngs = jax.random.split(aug_rng, accum)

        def one(carry, xs):
            stats, gsum, lsum, msum = carry
            mb, rng = xs
            (loss, (stats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, mb, rng)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            msum = jax.tree.map(jnp.add, msum, metrics)
            return (stats, gsum, lsum + loss, msum), None

        zero_g = jax.tree.map(jnp.zeros_like, params)
        # derive the metrics-zeros from the loss itself so the scan carry
        # can never drift from ops/losses.py's metrics schema
        mb0 = jax.tree.map(lambda v: v[0], micro)
        m_shape = jax.eval_shape(
            lambda p, s, mb, r: loss_fn(p, s, mb, r)[1][1],
            params, batch_stats, mb0, rngs[0])
        zero_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
        (new_stats, gsum, lsum, msum), _ = jax.lax.scan(
            one, (batch_stats, zero_g, jnp.zeros(()), zero_m),
            (micro, rngs))
        inv = 1.0 / accum
        grads = jax.tree.map(lambda g: (g * inv).astype(g.dtype), gsum)
        metrics = {k: v * inv for k, v in msum.items()}
        return lsum * inv, new_stats, metrics, grads

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Batch) -> Tuple[TrainState, Dict[str, Array]]:
        # deterministic per-step augmentation stream, no host RNG traffic
        aug_rng = jax.random.fold_in(jax.random.PRNGKey(t.seed), state.step)
        loss, new_stats, metrics, grads = grads_of(
            state.params, state.batch_stats, batch, aug_rng)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None:
            d = jnp.float32(t.ema_decay)
            ema = jax.tree.map(
                lambda e, p: (e * d + p.astype(jnp.float32) * (1 - d)
                              ).astype(e.dtype), ema, params)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=new_stats, opt_state=opt_state, ema_params=ema)
        return new_state, metrics

    return step


def train_step(state: TrainState, batch: Batch):
    """Public mirror of the reference's per-iteration update (SURVEY.md §0.11)."""
    return make_train_step(state.cfg)(state, batch)
