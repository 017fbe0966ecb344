"""Weight-importer tests: name mapping, shape checks, and a REAL torch
differential forward — a hand-written torch ResNet replica (torchvision
naming) runs the same weights as the flax backbone and must agree to fp32
tolerance. This is the bit-comparability anchor for pretrained backbones
(SURVEY.md §5.4, §7 "BN semantics / padding are the silent mAP killers")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detjax.models.resnet import ResNet
from detjax.utils.torch_import import (
    _torch_resnet_key_map,
    import_resnet_backbone,
)

STAGES = (1, 1, 1, 1)  # one bottleneck per stage: fast but covers all paths


def _rand_sd(rng):
    """Random torchvision-format state_dict for STAGES."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    sd["conv1.weight"] = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    bn("bn1", 64)
    in_c = 64
    for s, f in enumerate((64, 128, 256, 512)):
        p = f"layer{s + 1}.0"
        sd[f"{p}.conv1.weight"] = rng.normal(0, 0.05, (f, in_c, 1, 1)).astype(np.float32)
        bn(f"{p}.bn1", f)
        sd[f"{p}.conv2.weight"] = rng.normal(0, 0.05, (f, f, 3, 3)).astype(np.float32)
        bn(f"{p}.bn2", f)
        sd[f"{p}.conv3.weight"] = rng.normal(0, 0.05, (4 * f, f, 1, 1)).astype(np.float32)
        bn(f"{p}.bn3", 4 * f)
        sd[f"{p}.downsample.0.weight"] = rng.normal(
            0, 0.05, (4 * f, in_c, 1, 1)).astype(np.float32)
        bn(f"{p}.downsample.1", 4 * f)
        in_c = 4 * f
    return sd


def _flax_backbone_and_vars():
    model = ResNet(stage_sizes=STAGES, dtype=jnp.float32, frozen_bn=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    return model, variables


def test_import_maps_all_keys(rng):
    model, variables = _flax_backbone_and_vars()
    sd = _rand_sd(rng)
    params = {"backbone": variables["params"]}
    stats = {"backbone": variables["batch_stats"]}
    new_p, new_s, report = import_resnet_backbone(
        params, stats, sd, stage_sizes=STAGES)
    assert not report["missing"]
    assert not report["unused"]
    # conv kernel transposed OIHW→HWIO
    np.testing.assert_allclose(
        new_p["backbone"]["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        new_s["backbone"]["bn1"]["mean"], sd["bn1.running_mean"])
    np.testing.assert_allclose(
        new_p["backbone"]["layer2_block0"]["downsample_bn"]["scale"],
        sd["layer2.0.downsample.1.weight"])


def test_multiblock_stage_has_downsample_only_on_block0():
    """torchvision puts the projection shortcut only on block 0 of each
    stage; the key map must not expect downsample weights elsewhere
    (regression: real R50 checkpoints failed strict import)."""
    m = _torch_resnet_key_map((2, 2, 2, 2))
    assert "layer1.0.downsample.0" in m
    assert "layer1.1.downsample.0" not in m
    assert "layer3.1.conv2" in m


def test_import_shape_mismatch_raises(rng):
    model, variables = _flax_backbone_and_vars()
    sd = _rand_sd(rng)
    sd["conv1.weight"] = sd["conv1.weight"][:, :, :3, :3]
    with pytest.raises(ValueError, match="shape mismatch"):
        import_resnet_backbone({"backbone": variables["params"]},
                               {"backbone": variables["batch_stats"]},
                               sd, stage_sizes=STAGES)


def _torch_forward(sd, x_nchw):
    """torchvision-exact forward for STAGES in raw torch.nn.functional."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def bn(x, p):
        return F.batch_norm(x, t[f"{p}.running_mean"], t[f"{p}.running_var"],
                            t[f"{p}.weight"], t[f"{p}.bias"],
                            training=False, eps=1e-5)

    x = torch.from_numpy(x_nchw)
    x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for s in range(4):
        p = f"layer{s + 1}.0"
        stride = 1 if s == 0 else 2
        idn = F.conv2d(x, t[f"{p}.downsample.0.weight"], stride=stride)
        idn = bn(idn, f"{p}.downsample.1")
        y = F.relu(bn(F.conv2d(x, t[f"{p}.conv1.weight"]), f"{p}.bn1"))
        y = F.relu(bn(F.conv2d(y, t[f"{p}.conv2.weight"], stride=stride,
                               padding=1), f"{p}.bn2"))
        y = bn(F.conv2d(y, t[f"{p}.conv3.weight"]), f"{p}.bn3")
        x = F.relu(y + idn)
    return x.numpy()


FPN_C = 32  # small feature_size for test speed (lineage default 256)
N_CLASSES = 8


def _rand_detector_sd(rng):
    """Random full lineage-detector state_dict: backbone at top level +
    fpn.P*_{1,2}/P6/P7_2 + classificationModel/regressionModel."""
    sd = _rand_sd(rng)

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (cout, cin, k, k)).astype(
            np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.05, cout).astype(np.float32)

    for lvl, cin in ((3, 512), (4, 1024), (5, 2048)):
        conv(f"fpn.P{lvl}_1", FPN_C, cin, 1)
        conv(f"fpn.P{lvl}_2", FPN_C, FPN_C, 3)
    conv("fpn.P6", FPN_C, 2048, 3)
    conv("fpn.P7_2", FPN_C, FPN_C, 3)
    for tower, cout in (("classificationModel", 9 * N_CLASSES),
                        ("regressionModel", 9 * 4)):
        for i in range(1, 5):
            conv(f"{tower}.conv{i}", FPN_C, FPN_C, 3)
        conv(f"{tower}.output", cout, FPN_C, 3)
    return sd


def _flax_detector_and_vars():
    import flax.linen as nn

    from detjax.models.fpn import FPN
    from detjax.models.heads import RetinaNetHead

    class TinyDetector(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats = ResNet(stage_sizes=STAGES, dtype=jnp.float32,
                           frozen_bn=True, name="backbone")(x)
            feats = {l: f for l, f in feats.items() if l >= 3}
            pyr = FPN(min_level=3, max_level=7, channels=FPN_C,
                      dtype=jnp.float32, name="fpn")(feats)
            return RetinaNetHead(num_classes=N_CLASSES, channels=FPN_C,
                                 dtype=jnp.float32, name="head")(pyr)

    model = TinyDetector()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    return model, variables


def _torch_detector_forward(sd, x_nchw):
    """Full lineage detector forward (backbone→PyramidFeatures→heads) in raw
    torch.nn.functional; returns (cls_logits [B,ΣA,K], box [B,ΣA,4])."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def bn(x, p):
        return F.batch_norm(x, t[f"{p}.running_mean"], t[f"{p}.running_var"],
                            t[f"{p}.weight"], t[f"{p}.bias"],
                            training=False, eps=1e-5)

    def conv(x, p, stride=1, padding=0):
        return F.conv2d(x, t[f"{p}.weight"], t[f"{p}.bias"], stride=stride,
                        padding=padding)

    x = torch.from_numpy(x_nchw)
    x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    feats = {}
    for s in range(4):
        p = f"layer{s + 1}.0"
        stride = 1 if s == 0 else 2
        idn = bn(F.conv2d(x, t[f"{p}.downsample.0.weight"], stride=stride),
                 f"{p}.downsample.1")
        y = F.relu(bn(F.conv2d(x, t[f"{p}.conv1.weight"]), f"{p}.bn1"))
        y = F.relu(bn(F.conv2d(y, t[f"{p}.conv2.weight"], stride=stride,
                               padding=1), f"{p}.bn2"))
        y = bn(F.conv2d(y, t[f"{p}.conv3.weight"]), f"{p}.bn3")
        x = F.relu(y + idn)
        feats[s + 2] = x
    c3, c4, c5 = feats[3], feats[4], feats[5]

    # PyramidFeatures (lineage order of ops)
    p5 = conv(c5, "fpn.P5_1")
    p5_up = F.interpolate(p5, scale_factor=2, mode="nearest")
    p5 = conv(p5, "fpn.P5_2", padding=1)
    p4 = conv(c4, "fpn.P4_1") + p5_up
    p4_up = F.interpolate(p4, scale_factor=2, mode="nearest")
    p4 = conv(p4, "fpn.P4_2", padding=1)
    p3 = conv(c3, "fpn.P3_1") + p4_up
    p3 = conv(p3, "fpn.P3_2", padding=1)
    p6 = conv(c5, "fpn.P6", stride=2, padding=1)
    p7 = conv(F.relu(p6), "fpn.P7_2", stride=2, padding=1)

    cls_all, box_all = [], []
    for lvl in (p3, p4, p5, p6, p7):
        c = lvl
        for i in range(1, 5):
            c = F.relu(conv(c, f"classificationModel.conv{i}", padding=1))
        c = conv(c, "classificationModel.output", padding=1)
        # lineage reshape: (B, A*K, H, W) → (B, H, W, A, K) → (B, ·, K)
        b_, _, h_, w_ = c.shape
        cls_all.append(c.permute(0, 2, 3, 1).reshape(b_, -1, N_CLASSES))
        r = lvl
        for i in range(1, 5):
            r = F.relu(conv(r, f"regressionModel.conv{i}", padding=1))
        r = conv(r, "regressionModel.output", padding=1)
        box_all.append(r.permute(0, 2, 3, 1).reshape(b_, -1, 4))
    return (torch.cat(cls_all, dim=1).numpy(),
            torch.cat(box_all, dim=1).numpy())


def test_full_detector_import_matches_torch(rng):
    """Full lineage checkpoint (backbone+FPN+heads) imports completely and
    the flax forward matches the torch replica — the bridge to
    'bit-comparable boxes/scores' (VERDICT round-1 missing #3)."""
    from detjax.utils.torch_import import import_full_detector

    model, variables = _flax_detector_and_vars()
    sd = _rand_detector_sd(rng)
    new_p, new_s, report = import_full_detector(
        variables["params"], variables["batch_stats"], sd,
        stage_sizes=STAGES)
    assert not report["missing"]
    assert not report["unused"]

    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    cls, box = model.apply({"params": new_p, "batch_stats": new_s},
                           jnp.asarray(x))
    want_cls, want_box = _torch_detector_forward(
        sd, np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(cls), want_cls, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(box), want_box, atol=5e-4, rtol=5e-4)


def test_full_detector_import_strict_reports_missing(rng):
    from detjax.utils.torch_import import import_full_detector

    model, variables = _flax_detector_and_vars()
    sd = _rand_detector_sd(rng)
    del sd["fpn.P6.weight"], sd["classificationModel.output.bias"]
    with pytest.raises(KeyError, match="missing"):
        import_full_detector(variables["params"], variables["batch_stats"],
                             sd, stage_sizes=STAGES)


def test_flax_matches_torch_forward(rng):
    """Imported weights must produce the same features as torch — catches
    padding-alignment and BN-semantics drift."""
    model, variables = _flax_backbone_and_vars()
    sd = _rand_sd(rng)
    new_p, new_s, _ = import_resnet_backbone(
        {"backbone": variables["params"]},
        {"backbone": variables["batch_stats"]}, sd, stage_sizes=STAGES)

    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    feats = model.apply(
        {"params": new_p["backbone"], "batch_stats": new_s["backbone"]},
        jnp.asarray(x), train=False)
    c5 = np.asarray(feats[5])  # [1, 2, 2, 2048] NHWC

    want = _torch_forward(sd, np.transpose(x, (0, 3, 1, 2)))  # NCHW
    want_nhwc = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(c5, want_nhwc, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# BasicBlock (R18/34) import + differential forward
# ---------------------------------------------------------------------------

BASIC_STAGES = (1, 1, 1, 1)


def _rand_sd_basic(rng):
    """Random torchvision-format R18-style state_dict for BASIC_STAGES."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    sd["conv1.weight"] = rng.normal(0, 0.05, (64, 3, 7, 7)).astype(np.float32)
    bn("bn1", 64)
    in_c = 64
    for s, f in enumerate((64, 128, 256, 512)):
        p = f"layer{s + 1}.0"
        sd[f"{p}.conv1.weight"] = rng.normal(0, 0.05, (f, in_c, 3, 3)).astype(np.float32)
        bn(f"{p}.bn1", f)
        sd[f"{p}.conv2.weight"] = rng.normal(0, 0.05, (f, f, 3, 3)).astype(np.float32)
        bn(f"{p}.bn2", f)
        if s > 0:  # no projection on layer1: 64→64 stride 1
            sd[f"{p}.downsample.0.weight"] = rng.normal(
                0, 0.05, (f, in_c, 1, 1)).astype(np.float32)
            bn(f"{p}.downsample.1", f)
        in_c = f
    return sd


def _torch_forward_basic(sd, x_nchw):
    """torchvision-exact BasicBlock forward for BASIC_STAGES in raw torch."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def bn(x, p):
        return F.batch_norm(x, t[f"{p}.running_mean"], t[f"{p}.running_var"],
                            t[f"{p}.weight"], t[f"{p}.bias"],
                            training=False, eps=1e-5)

    x = torch.from_numpy(x_nchw)
    x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for s in range(4):
        p = f"layer{s + 1}.0"
        stride = 1 if s == 0 else 2
        if s > 0:
            idn = F.conv2d(x, t[f"{p}.downsample.0.weight"], stride=stride)
            idn = bn(idn, f"{p}.downsample.1")
        else:
            idn = x
        y = F.relu(bn(F.conv2d(x, t[f"{p}.conv1.weight"], stride=stride,
                               padding=1), f"{p}.bn1"))
        y = bn(F.conv2d(y, t[f"{p}.conv2.weight"], padding=1), f"{p}.bn2")
        x = F.relu(y + idn)
    return x.numpy()


def test_basic_key_map_shape():
    from detjax.utils.torch_import import _torch_resnet_key_map

    m = _torch_resnet_key_map((2, 2, 2, 2), block="basic")
    assert "layer1.0.conv2" in m
    assert "layer1.0.conv3" not in m           # basic: two convs only
    assert "layer1.0.downsample.0" not in m    # no projection on layer1
    assert "layer2.0.downsample.0" in m
    assert "layer2.1.downsample.0" not in m


def test_import_basic_and_differential_forward(rng):
    from detjax.models.resnet import ResNet

    model = ResNet(stage_sizes=BASIC_STAGES, block="basic",
                   dtype=jnp.float32, frozen_bn=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    sd = _rand_sd_basic(rng)
    new_p, new_s, report = import_resnet_backbone(
        {"backbone": variables["params"]},
        {"backbone": variables["batch_stats"]},
        sd, stage_sizes=BASIC_STAGES, block="basic")
    assert not report["missing"]
    assert not report["unused"]

    x = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    ref_c5 = _torch_forward_basic(sd, x)  # NCHW
    feats = model.apply(
        {"params": new_p["backbone"], "batch_stats": new_s["backbone"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    got_c5 = np.transpose(np.asarray(feats[5]), (0, 3, 1, 2))
    np.testing.assert_allclose(got_c5, ref_c5, rtol=2e-4, atol=2e-4)
