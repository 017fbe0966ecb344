"""Multi-scale training tests (benchmark config 4): per-resolution steps
share one TrainState; dispatch is by static batch shape — no retraces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset
from detjax.train import make_train_state
from detjax.train.multiscale import (
    MultiScaleIterator,
    make_multiscale_train_step,
    scale_configs,
)

SCALES = ((64, 64), (96, 96))


def _cfg():
    return get_config("retinanet_r50_640", **{
        "model.image_size": (64, 64),
        "model.num_classes": 4,
        "train.batch_size": 2,
        "train.max_gt": 4,
        "train.learning_rate": 1e-3,
    })


def _batch(hw):
    rng = np.random.default_rng(0)
    h, w = hw
    return {
        "images": jnp.asarray(rng.normal(0, 1, (2, h, w, 3)), jnp.float32),
        "gt_boxes": jnp.asarray(
            [[[8, 8, 40, 40], [20, 20, 50, 50], [0, 0, 0, 0], [0, 0, 0, 0]]] * 2,
            jnp.float32),
        "gt_labels": jnp.asarray([[1, 2, -1, -1]] * 2, jnp.int32),
    }


def test_scale_configs_only_change_resolution():
    cfgs = scale_configs(_cfg(), SCALES)
    assert [c.model.image_size for c in cfgs] == list(SCALES)
    assert all(c.train == cfgs[0].train for c in cfgs)


def test_multiscale_step_shares_state():
    cfg = _cfg()
    step = make_multiscale_train_step(cfg, SCALES)
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    state, m1 = step(state, _batch(SCALES[0]))
    state, m2 = step(state, _batch(SCALES[1]))  # same params, new resolution
    assert int(state.step) == 2
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    with pytest.raises(KeyError):
        step(state, _batch((80, 80)))


def test_multiscale_iterator_cycles_all_resolutions():
    cfg = _cfg()
    ds = SyntheticDetectionDataset(num_images=8, image_size=(128, 128),
                                   num_classes=4, max_objects=2)
    it = iter(MultiScaleIterator(ds, cfg, SCALES, seed=0))
    seen = set()
    for _ in range(4):
        b = next(it)
        seen.add(tuple(b["images"].shape[1:3]))
    assert seen == set(SCALES)
