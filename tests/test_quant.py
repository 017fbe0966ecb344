"""Int8 PTQ inference engine tests (detjax/quant.py).

1. The pure-function traversal is FAITHFUL: forward_fp in fp32 matches
   Detector.apply to fp32 tolerance for both block families (R18 basic,
   R50 bottleneck) and the SSD head.
2. Quantization round-trip: int8 weights/per-channel scales well-formed,
   BN folded, and the int8 forward tracks the fp forward closely on
   random weights.
3. detect_int8 returns the standard Detections contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detjax import quant
from detjax.config import get_config
from detjax.modeling import build_model

FP32 = {"model.dtype": "float32"}


def _cfg(depth=18, family=None, size=64, classes=8):
    over = {"model.image_size": (size, size),
            "model.backbone_depth": depth,
            "model.num_classes": classes, **FP32}
    name = "ssd_512" if family == "ssd" else "retinanet_r50_640"
    return get_config(name, **over)


@pytest.mark.parametrize("depth,family", [(18, None), (50, None), (50, "ssd")])
def test_forward_fp_matches_module(depth, family):
    cfg = _cfg(depth, family)
    module, variables = build_model(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    want_cls, want_box = module.apply(variables, x, train=False)
    got_cls, got_box = quant.forward_fp(variables, cfg, x, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_box), np.asarray(want_box),
                               rtol=1e-4, atol=1e-4)


def test_calib_mode_percentile():
    """p999 calibration clips activation outliers: its per-site scales are
    <= absmax's everywhere, strictly smaller where outliers exist, and the
    resulting engine still runs (VERDICT r3 #7; --int8-calib-mode)."""
    cfg = _cfg(18)
    _, variables = build_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    s_max = quant.calibrate(variables, cfg, x, calib_mode="absmax")
    s_pct = quant.calibrate(variables, cfg, x, calib_mode="p999")
    assert set(s_max) == set(s_pct)
    assert all(s_pct[k] <= s_max[k] * (1 + 1e-6) for k in s_max)
    # the input site sees raw gaussians → its 99.9th %ile is clearly
    # below the max over ~24k samples
    assert any(s_pct[k] < 0.97 * s_max[k] for k in s_max)
    qtree = quant.quantize_model(variables, cfg, x, calib_mode="p999")
    det = quant.detect_int8(qtree, x, cfg)
    assert det.boxes.shape[-1] == 4
    with pytest.raises(ValueError, match="calib_mode"):
        quant.calibrate(variables, cfg, x, calib_mode="minmax")


def test_quantize_tree_wellformed():
    cfg = _cfg(18)
    _, variables = build_model(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    qtree = quant.quantize_model(variables, cfg, x)
    w = qtree["weights"]["backbone/conv1"]
    # the stem is a bf16 island (C=3 conv — int8 buys nothing, the
    # requant traffic costs ~1.5 ms/batch; quant.py quantize())
    assert w["w16"].dtype == jnp.bfloat16
    assert w["b"].shape == (64,)   # folded BN bias (conv had none)
    w = qtree["weights"]["backbone/layer1_block0/conv1"]
    assert w["w"].dtype == jnp.int8
    assert w["ws"].shape == (64,)  # per-output-channel scales
    # every conv kernel in params has a quantized counterpart
    assert "backbone/layer2_block0/downsample_conv" in qtree["weights"]
    assert "fpn/lateral_p3" in qtree["weights"]
    assert "head/cls_out" in qtree["weights"]
    # head tower sites are per level (shared weights, per-site act scale)
    assert "head/cls_conv0@p3" in qtree["act_scales"]
    assert "head/cls_conv0@p7" in qtree["act_scales"]
    # backbone producer (requant) sites for the int8-native chain
    assert "backbone/conv1@out" in qtree["act_scales"]
    assert "backbone/layer1_block0@out" in qtree["act_scales"]


def test_int8_tracks_fp_and_detect_contract():
    cfg = _cfg(18, classes=4)
    _, variables = build_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    qtree = quant.quantize_model(variables, cfg, x)

    fp_cls, fp_box = quant.forward_fp(variables, cfg, x, dtype=jnp.float32)
    q_cls, q_box = quant.forward_int8(qtree, cfg, x)
    fp_cls = np.asarray(fp_cls, np.float32).ravel()
    q_cls = np.asarray(q_cls, np.float32).ravel()
    corr = np.corrcoef(fp_cls, q_cls)[0, 1]
    assert corr > 0.99, f"int8 logits decorrelated from fp: corr={corr}"
    # random-init logits sit near the prior bias ≈ -4.6; quant error must
    # stay well inside sigmoid-meaningful range
    assert np.abs(fp_cls - q_cls).mean() < 0.1

    dets = quant.detect_int8(qtree, x, cfg)
    assert dets.boxes.shape == (2, cfg.eval.max_detections, 4)
    assert dets.scores.shape == (2, cfg.eval.max_detections)
    assert dets.labels.dtype == jnp.int32
    assert np.isfinite(np.asarray(dets.boxes)).all()
