"""Model stack tests: shapes, anchor-order contract, init semantics, jit
(SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detjax.config import get_config
from detjax.modeling import anchor_config, build_model
from detjax.ops.anchors import num_anchors

SMALL = {"model.image_size": (128, 128)}


@pytest.fixture(scope="module")
def r50_small():
    cfg = get_config("retinanet_r50_640", **SMALL)
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    return cfg, module, variables


def test_output_shapes_match_anchors(r50_small):
    cfg, module, variables = r50_small
    x = jnp.zeros((2, 128, 128, 3))
    cls, box = module.apply(variables, x, train=False)
    a = num_anchors((128, 128), anchor_config(cfg))
    assert cls.shape == (2, a, 80)
    assert box.shape == (2, a, 4)
    # raw head outputs stay in compute dtype (bf16) — consumers cast
    assert cls.dtype == jnp.bfloat16


def test_prior_prob_init(r50_small):
    cfg, module, variables = r50_small
    x = jnp.zeros((1, 128, 128, 3))
    cls, _ = module.apply(variables, x, train=False)
    p = jax.nn.sigmoid(np.asarray(cls))
    # prior-prob init (SURVEY.md §3.5): mean prob ≈ π = 0.01 at init
    assert 0.002 < p.mean() < 0.05


def test_param_count_r50(r50_small):
    _, _, variables = r50_small
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    # RetinaNet-R50: ~38M (backbone 23.5M + FPN + heads); lineage-typical
    assert 35e6 < n < 42e6


def test_ssd_head_variant():
    cfg = get_config("ssd_512", **{"model.image_size": (128, 128)})
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    cls, box = module.apply(variables, x, train=False)
    a = num_anchors((128, 128), anchor_config(cfg))
    assert cls.shape == (1, a, 80)
    assert box.shape == (1, a, 4)


def test_r101_builds():
    cfg = get_config("retinanet_r101_fpn", **SMALL)
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert n > 50e6  # R101 backbone is ~42.5M alone


def test_frozen_bn_no_stat_updates(r50_small):
    cfg, module, variables = r50_small
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    _, mutated = module.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_forward_jit_no_retrace(r50_small):
    import chex
    cfg, module, variables = r50_small

    @jax.jit
    @chex.assert_max_traces(n=1)
    def f(v, x):
        return module.apply(v, x, train=False)

    for i in range(2):
        x = jnp.full((1, 128, 128, 3), float(i))
        cls, box = f(variables, x)
    assert np.isfinite(np.asarray(cls)).all()


def test_basicblock_depth_family():
    """R18/R34 use BasicBlock (SURVEY.md §2 #1 key classes); C3..C5 channels
    are 128/256/512 (expansion 1) and the FPN laterals adapt."""
    cfg = get_config("retinanet_r50_640",
                     **{"model.image_size": (128, 128),
                        "model.backbone_depth": 18})
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    cls, box = module.apply(variables, x, train=False)
    a = num_anchors((128, 128), anchor_config(cfg))
    assert cls.shape == (1, a, 80)
    assert box.shape == (1, a, 4)
    p = variables["params"]["backbone"]
    # basic blocks: no conv3, no projection on layer1 (64→64 stride 1)
    assert "conv3" not in p["layer1_block0"]
    assert "downsample_conv" not in p["layer1_block0"]
    assert "downsample_conv" in p["layer2_block0"]
    n = sum(np.prod(q.shape) for q in jax.tree.leaves(variables["params"]))
    # R18 backbone 11.2M + FPN ~3.8M + heads ~6.5M
    assert 18e6 < n < 25e6


def test_resnet_spec_dispatch():
    from detjax.models import RESNET_SPECS, resnet_by_depth

    assert RESNET_SPECS[34] == ("basic", (3, 4, 6, 3))
    assert RESNET_SPECS[152] == ("bottleneck", (3, 8, 36, 3))
    m = resnet_by_depth(34, dtype=jnp.float32)
    assert m.block == "basic" and m.stage_sizes == (3, 4, 6, 3)
    with pytest.raises(ValueError, match="unsupported backbone depth"):
        resnet_by_depth(42)


def test_all_presets_construct_and_latency_preset():
    """Every registered preset builds a valid frozen Config; the latency
    preset (bs=1 serving, VERDICT round-1 weak #7) shares the flagship
    model exactly and differs only in the NMS candidate budget."""
    from detjax.config import PRESETS

    for name in PRESETS:
        cfg = get_config(name)
        assert cfg.model.name == name
        hash(cfg)  # jit-static: must stay hashable

    full = get_config("retinanet_r50_640")
    lat = get_config("retinanet_r50_640_latency")
    assert lat.eval.pre_nms_top_k == 512 < full.eval.pre_nms_top_k
    assert lat.eval.batch_size == 1
    same = ("backbone_depth", "image_size", "num_classes", "anchor_scales",
            "anchor_ratios", "min_level", "max_level")
    for f in same:
        assert getattr(lat.model, f) == getattr(full.model, f), f


def test_dot1x1_lowerings_match_conv():
    """The dot-form 1x1 lowerings (ModelConfig.dot_1x1, the conv-backward
    campaign) keep an nn.Conv-identical param tree and exact fp32
    numerics: "full" relowers the forward as a dot, "dw" keeps a
    conv-form forward but computes the weight gradient as a dot via a
    custom VJP."""
    from detjax.models.resnet import DotConv1x1, _conv1x1, conv1x1_dotdw

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)
    ref = __import__("flax.linen", fromlist=["linen"]).Conv(
        24, (1, 1), use_bias=False, dtype=jnp.float32,
        kernel_init=jax.nn.initializers.he_normal())
    variables = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(variables, x)
    for mode in ("full", "dw"):
        mod = DotConv1x1(24, dtype=jnp.float32, mode=mode)
        # identical param tree: the reference Conv's variables apply as-is
        y = mod.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5)

    # dw-mode custom VJP == autodiff of the conv, fp32-exact
    k = variables["params"]["kernel"]
    ct = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 24)), jnp.float32)
    gx_r, gk_r = jax.grad(
        lambda a, b: jnp.vdot(_conv1x1(a, b), ct), (0, 1))(x, k)
    gx_d, gk_d = jax.grad(
        lambda a, b: jnp.vdot(conv1x1_dotdw(a, b), ct), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_d), np.asarray(gk_r),
                               atol=1e-3, rtol=1e-4)


def test_dot1x1_detector_param_tree_unchanged():
    """Flipping dot_1x1 must not move a single param: checkpoints and the
    torch importer are lowering-agnostic."""
    cfg_off = get_config("retinanet_r50_640", **SMALL)
    cfg_dw = get_config("retinanet_r50_640",
                        **{**SMALL, "model.dot_1x1": "dw"})
    _, v_off = build_model(cfg_off, jax.random.PRNGKey(0))
    _, v_dw = build_model(cfg_dw, jax.random.PRNGKey(0))
    assert jax.tree.structure(v_off) == jax.tree.structure(v_dw)
    for a, b in zip(jax.tree.leaves(v_off), jax.tree.leaves(v_dw)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_remat_early_param_tree_and_numerics():
    """model.remat_early (the stem/layer1 backward traffic-reduction A/B,
    VERDICT r3 #3) is a pure scheduling change: the param tree is
    untouched, and loss AND grads are bit-identical — remat recomputes
    the same ops on the same inputs."""
    from detjax.train.step import make_train_state, make_train_step

    ovr = {**SMALL, "model.num_classes": 8, "train.batch_size": 2,
           "train.max_gt": 4}
    cfg0 = get_config("retinanet_r50_640", **ovr)
    cfg2 = get_config("retinanet_r50_640",
                      **{**ovr, "model.remat_early": 2})
    _, v0 = build_model(cfg0, jax.random.PRNGKey(0))
    _, v2 = build_model(cfg2, jax.random.PRNGKey(0))
    assert jax.tree.structure(v0) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)),
                              jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[8, 8, 60, 60], [30, 30, 100, 100], [0, 0, 0, 0],
              [0, 0, 0, 0]]], jnp.float32), (2, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[2, 5, -1, -1]], jnp.int32),
                              (2, 1)),
    }
    s0, m0 = make_train_step(cfg0)(
        make_train_state(cfg0, jax.random.PRNGKey(0)), batch)
    s2, m2 = make_train_step(cfg2)(
        make_train_state(cfg2, jax.random.PRNGKey(0)), batch)
    assert float(m0["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f8_remat_param_tree_and_close_numerics():
    """f8_remat_stages (traffic A/B variant b): identical param tree; the
    f8-stored block inputs perturb the loss only slightly (e4m3 has ~2
    significant digits on unit-scale activations)."""
    from detjax.train.step import make_train_state, make_train_step

    ovr = {**SMALL, "model.num_classes": 8, "train.batch_size": 2,
           "train.max_gt": 4}
    cfg0 = get_config("retinanet_r50_640", **ovr)
    cfg8 = get_config("retinanet_r50_640",
                      **{**ovr, "model.f8_remat_stages": 2})
    _, v0 = build_model(cfg0, jax.random.PRNGKey(0))
    _, v8 = build_model(cfg8, jax.random.PRNGKey(0))
    assert jax.tree.structure(v0) == jax.tree.structure(v8)

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (2, 128, 128, 3)),
                              jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[8, 8, 60, 60], [30, 30, 100, 100], [0, 0, 0, 0],
              [0, 0, 0, 0]]], jnp.float32), (2, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[2, 5, -1, -1]], jnp.int32),
                              (2, 1)),
    }
    _, m0 = make_train_step(cfg0)(
        make_train_state(cfg0, jax.random.PRNGKey(0)), batch)
    _, m8 = make_train_step(cfg8)(
        make_train_state(cfg8, jax.random.PRNGKey(0)), batch)
    l0, l8 = float(m0["loss"]), float(m8["loss"])
    assert np.isfinite(l8)
    assert abs(l8 - l0) <= 0.05 * abs(l0) + 1e-3, (l0, l8)


def test_detect_u8_matches_normalize_then_detect(r50_small):
    """detect_u8 (fused normalize+detect, one jit region — the serving
    path) must equal device_augment(out_dtype=model dtype) + detect
    EXACTLY: both run fp32 normalize math and a single cast to the model
    dtype before the identical detect graph."""
    from detjax.data.pipeline import device_augment
    from detjax.modeling import detect, detect_u8

    cfg, _, variables = r50_small
    canvases = np.random.default_rng(11).integers(
        0, 256, (2, 128, 128, 3), np.uint8)
    got = detect_u8(variables, jnp.asarray(canvases), cfg)

    x, _ = device_augment(jnp.asarray(canvases),
                          jnp.zeros((2, 1, 4), jnp.float32),
                          jax.random.PRNGKey(0), hflip_prob=0.0,
                          mean=cfg.data.mean, std=cfg.data.std,
                          out_dtype=cfg.model.dtype)
    want = detect(variables, x, cfg)
    np.testing.assert_array_equal(np.asarray(got.boxes),
                                  np.asarray(want.boxes))
    np.testing.assert_array_equal(np.asarray(got.scores),
                                  np.asarray(want.scores))
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(want.labels))
    np.testing.assert_array_equal(np.asarray(got.num_valid),
                                  np.asarray(want.num_valid))
