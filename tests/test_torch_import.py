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
