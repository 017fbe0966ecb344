"""Training-loop orchestration tests: fit() end-to-end on synthetic data,
ReduceLROnPlateau semantics, lr injection, Orbax checkpoint save/resume
(SURVEY.md §5.3/§5.4: resume must restore optimizer state + step exactly)."""

import numpy as np
import pytest

import jax

from detjax.config import get_config
from detjax.data import SyntheticDetectionDataset, make_train_iterator
from detjax.train import (
    ReduceLROnPlateau,
    fit,
    get_learning_rate,
    make_train_state,
    set_learning_rate,
)


def _cfg(**kw):
    base = {
        "model.image_size": (64, 64),
        "model.num_classes": 4,
        "train.batch_size": 2,
        "train.max_gt": 4,
        "train.learning_rate": 1e-3,
        "train.checkpoint_every_steps": 5,
        "train.eval_every_steps": 10 ** 9,
    }
    base.update(kw)
    return get_config("retinanet_r50_640", **base)


def test_set_get_learning_rate():
    cfg = _cfg()
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)


def test_plateau_controller_matches_torch_semantics():
    p = ReduceLROnPlateau(factor=0.5, patience=2, threshold=0.0)
    lr = 1.0
    # improving losses: no drop
    for v in (5.0, 4.0, 3.0):
        assert p.update(v, lr) is None
    # stagnation: drop only after patience+1 bad epochs
    assert p.update(3.0, lr) is None  # bad 1
    assert p.update(3.0, lr) is None  # bad 2
    assert p.update(3.0, lr) == pytest.approx(0.5)  # bad 3 > patience
    # counter resets after a drop
    assert p.update(3.0, 0.5) is None


def test_fit_runs_and_lr_is_adjustable(tmp_path):
    cfg = _cfg()
    ds = SyntheticDetectionDataset(num_images=8, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    it = make_train_iterator(ds, cfg)
    res = fit(cfg, it, num_steps=6, checkpoint_dir=str(tmp_path / "ckpt"),
              log_dir=str(tmp_path / "logs"), log_every=3)
    assert int(np.asarray(res.state.step)) == 6
    assert res.history, "history should have logged entries"
    assert all(np.isfinite(h["loss"]) for h in res.history if "loss" in h)
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


def test_prefetch_heuristic():
    """prefetch_is_profitable encodes the measured regimes (VERDICT r3
    #4): fast-PCIe transfer hides under compute → prefetch; tunnel-regime
    transfer (≥ half a step) cannot → serial."""
    from detjax.data.pipeline import prefetch_is_profitable

    assert prefetch_is_profitable(0.005, 0.1)   # real TPU host: 5 ms vs 100
    assert not prefetch_is_profitable(0.05, 0.1)  # boundary: half the step
    assert not prefetch_is_profitable(0.7, 0.1)   # axon tunnel: 7× the step


def test_fit_auto_prefetch_calibrates(capsys):
    """device_prefetch='auto' (the default) must measure transfer vs step
    during the first iterations and print its decision; the run itself
    stays numerically valid."""
    cfg = _cfg()
    assert cfg.data.device_prefetch == "auto"
    ds = SyntheticDetectionDataset(num_images=8, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    res = fit(cfg, make_train_iterator(ds, cfg), num_steps=6, log_every=3)
    assert int(np.asarray(res.state.step)) == 6
    out = capsys.readouterr().out
    assert "device_prefetch auto" in out, out


def test_metrics_logger_tensorboard_scalars(tmp_path):
    """tensorboard=True writes tf.summary event files next to the JSONL
    (SURVEY.md §5.5: 'optional TensorBoard'); JSONL stays the source of
    truth either way."""
    tf = pytest.importorskip("tensorflow")
    from detjax.utils.logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path), print_every=0, tensorboard=True)
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"loss": 0.25})
    logger.close()

    assert (tmp_path / "metrics.jsonl").exists()
    events = list((tmp_path / "tb").glob("events.*"))
    assert events, "tensorboard=True must write event files under <dir>/tb"
    seen = {}
    for rec in tf.data.TFRecordDataset(str(events[0])):
        ev = tf.compat.v1.Event.FromString(rec.numpy())
        for v in ev.summary.value:
            if v.tag == "train/loss":
                seen[ev.step] = tf.make_ndarray(v.tensor).item()
    assert seen == {1: pytest.approx(0.5), 2: pytest.approx(0.25)}


def test_fit_resume_from_checkpoint(tmp_path):
    cfg = _cfg()
    ds = SyntheticDetectionDataset(num_images=8, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    ckpt_dir = str(tmp_path / "ckpt")
    res1 = fit(cfg, make_train_iterator(ds, cfg), num_steps=5,
               checkpoint_dir=ckpt_dir)
    assert int(np.asarray(res1.state.step)) == 5
    # new fit with same dir resumes at 5 and continues to 8
    res2 = fit(cfg, make_train_iterator(ds, cfg), num_steps=8,
               checkpoint_dir=ckpt_dir)
    assert int(np.asarray(res2.state.step)) == 8
    # params actually moved on from the restored point
    p1 = jax.tree.leaves(res1.state.params)[0]
    p2 = jax.tree.leaves(res2.state.params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_iterator_seek_matches_stream():
    """iter_from(k) must reproduce batch k.. of the straight stream exactly
    (across an epoch boundary), including augmentation RNG."""
    cfg = _cfg()
    ds = SyntheticDetectionDataset(num_images=8, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    it = make_train_iterator(ds, cfg)
    straight = []
    s = iter(it)
    for _ in range(10):
        straight.append(next(s))
    k = 5  # 8 imgs / bs 2 = 4 batches/epoch → crosses into epoch 1
    seeked = it.iter_from(k)
    for j in range(k, 10):
        b = next(seeked)
        for key in ("images", "gt_boxes", "gt_labels", "image_id"):
            np.testing.assert_array_equal(b[key], straight[j][key])


def test_fit_resume_is_bitexact(tmp_path):
    """10 straight steps == 5 steps + checkpoint-resume + 5 steps, bit for
    bit (params AND optimizer state) — the data stream seeks to the same
    global batch and the plateau/window state round-trips (VERDICT #5)."""
    cfg = _cfg()

    def ds():
        return SyntheticDetectionDataset(num_images=8, image_size=(64, 64),
                                         num_classes=4, max_objects=2)

    straight = fit(cfg, make_train_iterator(ds(), cfg), num_steps=10)

    ckpt_dir = str(tmp_path / "ck")
    fit(cfg, make_train_iterator(ds(), cfg), num_steps=5,
        checkpoint_dir=ckpt_dir)
    resumed = fit(cfg, make_train_iterator(ds(), cfg), num_steps=10,
                  checkpoint_dir=ckpt_dir)

    for a, b in zip(jax.tree.leaves(straight.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.state.opt_state),
                    jax.tree.leaves(resumed.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_host_state_roundtrip(tmp_path):
    from detjax.train.checkpoint import Checkpointer

    cfg = _cfg()
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path / "ck"))
    host = {"plateau_best": 0.25, "plateau_num_bad": 2,
            "window_sum": 1.5, "window_n": 3}
    ck.save(state, wait=True, host=host)
    fresh = make_train_state(cfg, jax.random.PRNGKey(9))
    template = {"plateau_best": np.inf, "plateau_num_bad": 0,
                "window_sum": 0.0, "window_n": 0}
    restored, got = ck.restore(fresh, host_template=template)
    assert got == pytest.approx(host)
    # older checkpoints without a host subtree fall back to the template
    ck2 = Checkpointer(str(tmp_path / "ck2"))
    ck2.save(state, wait=True)
    _, got2 = ck2.restore(fresh, host_template=template)
    assert got2["plateau_num_bad"] == 0 and got2["window_n"] == 0


def test_fit_with_mesh_data_parallel(tmp_path):
    """Config-5 shape: fit() over the 8-fake-device mesh — params
    replicated, batch sharded, loop/checkpoint machinery unchanged."""
    from detjax.parallel import make_mesh

    cfg = _cfg(**{"train.batch_size": 8})
    ds = SyntheticDetectionDataset(num_images=16, image_size=(64, 64),
                                   num_classes=4, max_objects=2)
    mesh = make_mesh()
    res = fit(cfg, make_train_iterator(ds, cfg), num_steps=3, mesh=mesh,
              checkpoint_dir=str(tmp_path / "ckpt"))
    assert int(np.asarray(res.state.step)) == 3
    leaf = jax.tree.leaves(res.state.params)[0]
    assert len(leaf.sharding.device_set) == len(jax.devices())


def test_checkpoint_restore_detect_bitexact(tmp_path):
    """Detections from restored params must equal the originals exactly."""
    from detjax.modeling import detect
    from detjax.train.checkpoint import Checkpointer
    from detjax.train.step import make_train_state

    cfg = _cfg()
    state = make_train_state(cfg, jax.random.PRNGKey(1))
    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(state, wait=True)

    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    imgs = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    v1 = {"params": state.params, "batch_stats": state.batch_stats}
    d1 = detect(v1, imgs, cfg)

    fresh = make_train_state(cfg, jax.random.PRNGKey(99))
    restored = ck.restore(fresh)
    v2 = {"params": restored.params, "batch_stats": restored.batch_stats}
    d2 = detect(v2, imgs, cfg)
    np.testing.assert_array_equal(np.asarray(d1.boxes), np.asarray(d2.boxes))
    np.testing.assert_array_equal(np.asarray(d1.scores), np.asarray(d2.scores))
    np.testing.assert_array_equal(np.asarray(d1.labels), np.asarray(d2.labels))


def test_checkpoint_legacy_format_restore(tmp_path):
    """Checkpoints written by the pre-Composite layout (one 'default'
    StandardSave item, host scalars inline under 'host') must still
    restore through both the bare and host-template paths."""
    import orbax.checkpoint as ocp

    from detjax.train.checkpoint import Checkpointer

    cfg = _cfg()
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    tree = {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "host": {"plateau_best": np.asarray(1.5),
                     "plateau_num_bad": np.asarray(2)}}
    mgr = ocp.CheckpointManager(
        str(tmp_path), options=ocp.CheckpointManagerOptions(create=True))
    mgr.save(0, args=ocp.args.StandardSave(tree))
    mgr.wait_until_finished()
    mgr.close()

    restored, host = Checkpointer(str(tmp_path)).restore(
        state, host_template={"plateau_best": 0.0, "plateau_num_bad": 0})
    assert host == {"plateau_best": 1.5, "plateau_num_bad": 2}
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # legacy tree WITHOUT inline host: bare template + host fallback
    mgr2 = ocp.CheckpointManager(
        str(tmp_path / "nohost"),
        options=ocp.CheckpointManagerOptions(create=True))
    bare = {k: tree[k] for k in ("step", "params", "batch_stats",
                                 "opt_state")}
    mgr2.save(0, args=ocp.args.StandardSave(bare))
    mgr2.wait_until_finished()
    mgr2.close()
    r2 = Checkpointer(str(tmp_path / "nohost")).restore(state)
    for a, b in zip(jax.tree.leaves(r2.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, host2 = Checkpointer(str(tmp_path / "nohost")).restore(
        state, host_template={"plateau_best": 0.25})
    assert host2 == {"plateau_best": 0.25}
