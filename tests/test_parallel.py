"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4.4 — the fake-backend analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detjax.config import get_config
from detjax.parallel import make_mesh, make_parallel_train_step, shard_batch
from detjax.train.step import make_train_state, make_train_step


def _cfg(bs):
    return get_config("coco_v5e8", **{
        "model.image_size": (64, 64),
        "model.num_classes": 8,
        "train.batch_size": bs,
        "train.max_gt": 4,
    })


def _batch(bs):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.normal(0, 1, (bs, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[8, 8, 40, 40], [30, 30, 60, 60], [0, 0, 0, 0], [0, 0, 0, 0]]],
            jnp.float32), (bs, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[2, 5, -1, -1]], jnp.int32), (bs, 1)),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_parallel_step_runs_and_matches_single_device():
    bs = 8
    cfg = _cfg(bs)
    batch = _batch(bs)
    # single-device result
    s1 = make_train_state(cfg, jax.random.PRNGKey(0))
    s1, m1 = make_train_step(cfg)(s1, batch)
    # 8-way data-parallel result
    mesh = make_mesh()
    s8 = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_parallel_train_step(cfg, mesh)
    s8, m8 = step(s8, batch)
    # sharded psum reduces in a different order than a single-device sum —
    # bf16 compute + fp32 accum → ~1e-4 relative drift is expected
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-3)
    # params near-identical after one step (same grads via ICI psum)
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_batch_sharded_across_devices():
    mesh = make_mesh()
    batch = shard_batch(_batch(8), mesh)
    shards = batch["images"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 64, 64, 3)


def test_parallel_step_multiple_iterations_loss_decreases():
    bs = 8
    cfg = _cfg(bs)
    mesh = make_mesh()
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_parallel_train_step(cfg, mesh)
    batch = _batch(bs)
    first = None
    for _ in range(5):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_global_batch_from_local_single_process():
    """On one process the local shard IS the global batch; array must be
    sharded over the mesh batch axis."""
    import numpy as np
    from detjax.parallel import global_batch_from_local, make_mesh

    mesh = make_mesh()
    n = len(jax.devices())
    local = {"images": np.arange(n * 4 * 4 * 3, dtype=np.float32).reshape(
        n, 4, 4, 3)}
    g = global_batch_from_local(local, mesh)
    assert g["images"].shape == (n, 4, 4, 3)
    assert len(g["images"].sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(g["images"]), local["images"])


def test_parallel_step_with_grad_accum():
    """grad_accum_steps composes with pjit DP: the batch is sharded on the
    data axis AND scanned over micro-batches inside the same program; one
    step runs, loss is finite, params stay replicated."""
    cfg = get_config("coco_v5e8", **{
        "model.image_size": (64, 64), "model.num_classes": 8,
        "train.batch_size": 16, "train.max_gt": 4,
        "train.grad_accum_steps": 2})
    mesh = make_mesh()
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_parallel_train_step(cfg, mesh)
    state, metrics = step(state, _batch(16))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_spatial_partitioned_step_matches_single_device():
    """DP×SP 2-D mesh (4 data × 2 space): image ROWS sharded over 'space',
    conv stack spatially partitioned by GSPMD (halo exchanges), anchor-space
    ops resharded to P('data') at the flatten boundary. One step must agree
    with the unsharded step — spatial partitioning is a layout, not a
    different program."""
    bs = 4
    cfg = get_config("coco_v5e8", **{
        "model.image_size": (128, 128), "model.num_classes": 8,
        "model.backbone_depth": 18,
        "train.batch_size": bs, "train.max_gt": 4,
    })
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, 128, 128, 3)),
                              jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[8, 8, 40, 40], [30, 30, 100, 100], [0, 0, 0, 0],
              [0, 0, 0, 0]]], jnp.float32), (bs, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[2, 5, -1, -1]], jnp.int32),
                              (bs, 1)),
    }
    s1 = make_train_state(cfg, jax.random.PRNGKey(0))
    s1, m1 = make_train_step(cfg)(s1, batch)

    mesh = make_mesh(spatial=2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (4, 2)
    s8 = make_train_state(cfg, jax.random.PRNGKey(0))
    step = make_parallel_train_step(cfg, mesh)
    s8, m8 = step(s8, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-3)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
    # params stay replicated after the step
    assert jax.tree.leaves(s8.params)[0].sharding.is_fully_replicated


def _spatial_cfg_and_batch():
    """The DP×SP workload shared by the spatial test and the Shardy
    canary (same config → shared compile-cache artifacts)."""
    bs = 4
    cfg = get_config("coco_v5e8", **{
        "model.image_size": (128, 128), "model.num_classes": 8,
        "model.backbone_depth": 18,
        "train.batch_size": bs, "train.max_gt": 4,
    })
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (bs, 128, 128, 3)),
                              jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[8, 8, 40, 40], [30, 30, 100, 100], [0, 0, 0, 0],
              [0, 0, 0, 0]]], jnp.float32), (bs, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[2, 5, -1, -1]], jnp.int32),
                              (bs, 1)),
    }
    return cfg, batch


def test_spatial_shardy_matches_gspmd():
    """The partitioner-migration equality pin (VERDICT r4 next #6).

    Round 4 pinned spatial-mesh compiles to legacy GSPMD propagation
    because Shardy (jax 0.9.0's default) miscompiled them. Round 5
    retired the pin: the model's spatial layout rule
    (detjax/models/spatial.py — FPN gather boundary when any pyramid
    level is too small to row-shard) makes the SAME step compile
    correctly under Shardy. This test pins the migration: the production
    path (make_parallel_train_step — Shardy + abstract-mesh context)
    must agree with BOTH the single-device step and the legacy-GSPMD
    compile of the same sharded program."""
    from detjax.parallel.mesh import _mesh_context, _shardy_toggle

    cfg, batch = _spatial_cfg_and_batch()
    s1 = make_train_state(cfg, jax.random.PRNGKey(0))
    _, m1 = make_train_step(cfg)(s1, batch)
    loss_ref = float(m1["loss"])

    mesh = make_mesh(spatial=2)
    step = make_parallel_train_step(cfg, mesh)  # Shardy (jax default)
    _, m_sh = step(make_train_state(cfg, jax.random.PRNGKey(0)), batch)
    loss_shardy = float(m_sh["loss"])
    np.testing.assert_allclose(loss_shardy, loss_ref, rtol=2e-3)

    toggle = _shardy_toggle()
    if toggle is None:
        print("legacy GSPMD toggle gone from this jax; Shardy==single "
              "equality stands alone")
        return
    batch_sh = shard_batch(batch, mesh)
    with toggle(False), _mesh_context(mesh)():
        _, m_g = make_train_step(cfg)(
            make_train_state(cfg, jax.random.PRNGKey(0)), batch_sh)
    loss_gspmd = float(m_g["loss"])
    np.testing.assert_allclose(loss_shardy, loss_gspmd, rtol=2e-3)
    print(f"spatial step: shardy {loss_shardy:.4f} == gspmd "
          f"{loss_gspmd:.4f} == single {loss_ref:.4f}")


def test_spatial_layout_rule():
    """models/spatial.py unshard_tiny_levels: identity without a spatial
    mesh; identity when every level is row-shardable; batch-only on ALL
    levels (the FPN gather boundary) as soon as one level is degenerate —
    a mixed layout would route the row→batch reshard through the
    partitioner's broken degenerate-tensor path (xla b/433785288)."""
    from detjax.models.spatial import unshard_tiny_levels

    mesh = make_mesh(spatial=2)

    def n_constraints(levels_rows):
        feats = {l: jnp.zeros((2, r, r, 8)) for l, r in levels_rows}
        with jax.sharding.use_abstract_mesh(mesh.abstract_mesh):
            jaxpr = jax.make_jaxpr(unshard_tiny_levels)(feats)
        return sum(1 for eqn in jaxpr.jaxpr.eqns
                   if "sharding_constraint" in str(eqn.primitive))

    # no mesh installed → no-op, usable under plain jit/init
    plain = unshard_tiny_levels({3: jnp.zeros((2, 16, 16, 8))})
    assert plain[3].shape == (2, 16, 16, 8)
    assert n_constraints([(3, 16), (4, 8), (5, 4)]) == 0  # healthy: SP on
    # degenerate pyramid (P6=2, P7=1 rows): ALL five levels constrained
    assert n_constraints([(3, 16), (4, 8), (5, 4), (6, 2), (7, 1)]) == 5
    # uneven rows (3 over 2 shards) also count as degenerate
    assert n_constraints([(3, 12), (4, 6), (5, 3)]) == 3


def test_spatial_shard_batch_layout():
    """shard_batch on a 2-D mesh: images sharded (data, space) — each
    device holds a [bs/4, H/2, W, C] tile — GT sharded on data only."""
    mesh = make_mesh(spatial=2)
    batch = shard_batch(_batch(8), mesh)
    img_shards = batch["images"].addressable_shards
    assert len(img_shards) == 8
    assert img_shards[0].data.shape == (2, 32, 64, 3)
    gt_shards = batch["gt_boxes"].addressable_shards
    assert gt_shards[0].data.shape == (2, 4, 4)


def test_make_mesh_spatial_must_divide():
    with pytest.raises(ValueError):
        make_mesh(spatial=3)


def test_sharded_eval_matches_unsharded():
    """run_coco_eval(mesh=...) shards eval batches over the data axis
    (config 5 periodic eval); the 12-stat table must match the unsharded
    run (same math, SPMD over batch)."""
    from detjax.data.synthetic import SyntheticDetectionDataset
    from detjax.evaluation.evaluator import run_coco_eval
    from detjax.train.step import make_train_state

    cfg = get_config("coco_v5e8", **{
        "model.image_size": (64, 64), "model.num_classes": 8,
        "model.dtype": "float32", "model.backbone_depth": 18,
        "train.max_gt": 4, "eval.batch_size": 8,
        "eval.pre_nms_top_k": 50, "eval.max_detections": 10,
        "eval.score_threshold": 0.0})
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ds = SyntheticDetectionDataset(num_images=8, image_size=(64, 64),
                                   num_classes=8, seed=5)
    plain = run_coco_eval(variables, ds, cfg)
    sharded = run_coco_eval(variables, ds, cfg, mesh=make_mesh())
    for k in plain.stats:
        assert abs(plain.stats[k] - sharded.stats[k]) < 1e-6, (
            k, plain.stats[k], sharded.stats[k])
    # and over a 2-D (data, space) mesh: spatially partitioned conv stack,
    # same 12-stat table (fp32 model → exact)
    spatial = run_coco_eval(variables, ds, cfg, mesh=make_mesh(spatial=2))
    for k in plain.stats:
        assert abs(plain.stats[k] - spatial.stats[k]) < 1e-6, (
            k, plain.stats[k], spatial.stats[k])
