"""Train-step tests: loss decreases, overfit sanity, grad-clip, jit
(SURVEY.md §7 build order #5 "overfit-10-images sanity")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detjax.config import get_config
from detjax.train.step import make_train_state, make_train_step, train_step


def _cfg(**kw):
    base = {
        "model.image_size": (64, 64),
        "model.num_classes": 8,
        "train.batch_size": 2,
        "train.max_gt": 4,
        "train.learning_rate": 1e-3,
    }
    base.update(kw)
    return get_config("retinanet_r50_640", **base)


def _batch():
    rng = np.random.default_rng(1)
    return {
        "images": jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(
            [[[8, 8, 40, 40], [30, 30, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]] * 2,
            jnp.float32),
        "gt_labels": jnp.asarray([[2, 5, -1, -1]] * 2, jnp.int32),
    }


def test_loss_decreases_on_fixed_batch():
    state = make_train_state(_cfg(), jax.random.PRNGKey(0))
    batch = _batch()
    first = None
    for i in range(10):
        state, m = train_step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    assert int(state.step) == 10
    assert np.isfinite(float(m["cls_loss"]))
    assert np.isfinite(float(m["reg_loss"]))
    assert float(m["num_pos"]) > 0


def test_grad_clip_applied():
    state = make_train_state(_cfg(), jax.random.PRNGKey(0))
    batch = _batch()
    _, m = train_step(state, batch)
    # optimizer saw clipped grads; metric reports raw global norm
    assert float(m["grad_norm"]) > 0


def test_empty_gt_batch_finite():
    state = make_train_state(_cfg(), jax.random.PRNGKey(0))
    batch = _batch()
    batch["gt_labels"] = jnp.full_like(batch["gt_labels"], -1)
    _, m = train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["num_pos"]) == 0
    assert float(m["reg_loss"]) == 0


def test_train_step_cached_per_config():
    cfg = _cfg()
    assert make_train_step(cfg) is make_train_step(cfg)


def test_grad_accum_matches_full_batch():
    """train.grad_accum_steps=2 must match the full-batch step to fp32
    summation noise: the loss is per-image normalized then batch-meaned
    (ops/losses.py), so averaging equal micro-batch grads IS the
    full-batch gradient. fp32 dtype + float images (augment skipped) to
    keep the comparison exact."""
    kw = {"model.dtype": "float32", "model.backbone_depth": 18,
          "train.batch_size": 4}
    cfg1 = _cfg(**kw)
    cfg2 = _cfg(**dict(kw, **{"train.grad_accum_steps": 2}))
    s1 = make_train_state(cfg1, jax.random.PRNGKey(0))
    s2 = make_train_state(cfg2, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(
            rng.uniform(0, 30, (4, 4, 2)).repeat(2, axis=-1) +
            np.concatenate([np.zeros((4, 4, 2)), np.full((4, 4, 2), 20)],
                           axis=-1).astype(np.float32), jnp.float32),
        "gt_labels": jnp.asarray(rng.integers(0, 8, (4, 4)), jnp.int32),
    }
    n1, m1 = train_step(s1, batch)
    n2, m2 = train_step(s2, batch)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert abs(float(m1["grad_norm"]) - float(m2["grad_norm"])) < 1e-4
    for a, b in zip(jax.tree.leaves(n1.params), jax.tree.leaves(n2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-5)


def test_grad_accum_rejects_indivisible_batch():
    cfg = _cfg(**{"model.dtype": "float32", "model.backbone_depth": 18,
                  "train.batch_size": 2, "train.grad_accum_steps": 3})
    s = make_train_state(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="grad_accum"):
        train_step(s, _batch())


def test_ema_params_follow_recurrence():
    """train.ema_decay>0 keeps an EMA shadow updated inside the step:
    after each step, ema == d*ema_prev + (1-d)*params_new exactly (fp32
    math in-step). Disabled default keeps ema_params None (no pytree
    structure change)."""
    d = 0.9
    cfg = _cfg(**{"model.dtype": "float32", "model.backbone_depth": 18,
                  "train.ema_decay": d})
    s = make_train_state(cfg, jax.random.PRNGKey(0))
    assert s.ema_params is not None
    ema = jax.tree.map(np.asarray, s.ema_params)
    batch = _batch()
    for _ in range(3):
        s, _ = train_step(s, batch)
        ema = jax.tree.map(
            lambda e, p: (e * d + np.asarray(p, np.float32) * (1 - d)),
            ema, s.params)
    for want, got in zip(jax.tree.leaves(ema),
                         jax.tree.leaves(s.ema_params)):
        np.testing.assert_allclose(want, np.asarray(got), rtol=1e-6,
                                   atol=1e-7)
    # EMA lags the live params while training moves
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(s.ema_params),
                             jax.tree.leaves(s.params))]
    assert max(diffs) > 0

    s_off = make_train_state(_cfg(**{"model.backbone_depth": 18}),
                             jax.random.PRNGKey(0))
    assert s_off.ema_params is None


def test_ema_checkpoint_roundtrip(tmp_path):
    from detjax.train.checkpoint import Checkpointer
    from detjax.train.step import ema_variables

    cfg = _cfg(**{"model.dtype": "float32", "model.backbone_depth": 18,
                  "train.ema_decay": 0.5})
    s = make_train_state(cfg, jax.random.PRNGKey(0))
    s, _ = train_step(s, _batch())
    ck = Checkpointer(str(tmp_path))
    ck.save(s, wait=True)
    s2 = ck.restore(make_train_state(cfg, jax.random.PRNGKey(1)))
    for a, b in zip(jax.tree.leaves(s.ema_params),
                    jax.tree.leaves(s2.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    v = ema_variables(s2)
    assert "params" in v and "batch_stats" in v
