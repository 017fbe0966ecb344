"""Serving-export tests: the StableHLO artifact round-trips through
serialize → deserialize and reproduces the live detect() path exactly
(SURVEY.md §5.4 — deployment artifact parity with the reference's
torch.save, minus the code dependency)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detjax.config import get_config
from detjax.export import export_detect, load_detect, save_detect
from detjax.modeling import build_model, detect


@pytest.fixture(scope="module")
def small_setup():
    # fp32: bf16 convs drift ~1e-2 across compilations (export lowers the
    # graph separately from the live jit), which would confound the
    # equality assertions below with recompilation noise.
    cfg = get_config(
        "retinanet_r50_640",
        **{"model.image_size": (64, 64), "model.num_classes": 4,
           "model.dtype": "float32", "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    return cfg, variables, images


def test_export_matches_live_detect(small_setup):
    cfg, variables, images = small_setup
    exp = export_detect(variables, cfg, batch_size=2)
    out = exp.call(images)
    ref = detect(variables, images, cfg)
    np.testing.assert_array_equal(np.asarray(out.num_valid),
                                  np.asarray(ref.num_valid))
    np.testing.assert_allclose(np.asarray(out.boxes), np.asarray(ref.boxes),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out.labels),
                                  np.asarray(ref.labels))


def test_export_serialize_roundtrip(small_setup, tmp_path):
    cfg, variables, images = small_setup
    path = str(tmp_path / "detect.stablehlo")
    save_detect(path, variables, cfg, batch_size=2)
    served = load_detect(path)
    out = served(images)
    ref = detect(variables, images, cfg)
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(ref.scores), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels),
                                  np.asarray(ref.labels))
    # artifact is self-contained: nontrivial size (weights baked in)
    import os
    assert os.path.getsize(path) > 1_000_000


def test_fp32_artifact_accepts_model_dtype_feed(small_setup, tmp_path):
    """Regression (hard-export gate, round 3): the evaluator feeds the
    detect path MODEL-dtype batches (the u8-fusion contract); an fp32
    artifact must cast a bf16 feed to its signature (exact) instead of
    raising a dtype mismatch. uint8 artifacts still reject float feeds."""
    cfg, variables, images = small_setup
    path = str(tmp_path / "detect32.stablehlo")
    save_detect(path, variables, cfg, batch_size=2)
    served = load_detect(path)
    out_bf = served(images.astype(jnp.bfloat16))
    # bf16 → fp32 is exact per element; outputs equal the bf16-rounded feed
    ref = served(images.astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(out_bf.scores),
                                  np.asarray(ref.scores))


def test_export_int8_engine_roundtrip(small_setup, tmp_path):
    """calibration= exports the PTQ int8 engine's graph; the reloaded
    artifact reproduces the live detect_int8 path on the same qtree."""
    from detjax import quant

    cfg, variables, images = small_setup
    calibration = images  # already normalized fp batch
    path = str(tmp_path / "detect_int8.stablehlo")
    save_detect(path, variables, cfg, batch_size=2, calibration=calibration)
    out = load_detect(path)(images)

    qtree = quant.quantize_model(variables, cfg, calibration)
    ref = quant.detect_int8(qtree, images, cfg)
    np.testing.assert_array_equal(np.asarray(out.num_valid),
                                  np.asarray(ref.num_valid))
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(ref.scores), rtol=1e-3, atol=1e-4)


def test_export_ssd_family(tmp_path):
    """The artifact path covers the SSD head family too (config 2), not
    just RetinaNet — per-level SSD anchors ride through jax.export."""
    cfg = get_config(
        "ssd_512",
        **{"model.image_size": (128, 128), "model.num_classes": 4,
           "model.dtype": "float32", "model.backbone_depth": 18,
           "eval.pre_nms_top_k": 50, "eval.max_detections": 10})
    _, variables = build_model(cfg)
    images = jax.random.uniform(jax.random.PRNGKey(11), (1, 128, 128, 3))
    path = str(tmp_path / "ssd.stablehlo")
    save_detect(path, variables, cfg, batch_size=1)
    out = load_detect(path)(images)
    ref = detect(variables, images, cfg)
    np.testing.assert_array_equal(np.asarray(out.num_valid),
                                  np.asarray(ref.num_valid))
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(ref.scores), rtol=1e-4, atol=1e-5)


def test_export_rejects_wrong_shape(small_setup):
    cfg, variables, _ = small_setup
    exp = export_detect(variables, cfg, batch_size=1)
    bad = jnp.zeros((3, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError):
        exp.call(bad)


def test_export_u8_input_format(small_setup, tmp_path):
    """input_format="u8": the artifact's input signature is uint8 (exposed
    via load_detect's in_dtype), normalization is baked into the graph,
    and the output equals the live fused detect_u8 path exactly (fp32
    model dtype — same math, separately lowered)."""
    from detjax.modeling import detect_u8

    cfg, variables, _ = small_setup
    canvases = jnp.asarray(np.random.default_rng(21).integers(
        0, 256, (2, 64, 64, 3), np.uint8))
    path = str(tmp_path / "detect_u8.stablehlo")
    save_detect(path, variables, cfg, batch_size=2, input_format="u8")
    served = load_detect(path)
    assert served.in_dtype == jnp.uint8
    assert served.in_shape == (2, 64, 64, 3)
    out = served(canvases)
    ref = detect_u8(variables, canvases, cfg)
    np.testing.assert_array_equal(np.asarray(out.num_valid),
                                  np.asarray(ref.num_valid))
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(ref.scores), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.labels),
                                  np.asarray(ref.labels))
    # legacy fp32 artifacts still advertise their signature
    path32 = str(tmp_path / "detect_fp32.stablehlo")
    save_detect(path32, variables, cfg, batch_size=2)
    assert load_detect(path32).in_dtype == jnp.float32

    with pytest.raises(ValueError, match="input_format"):
        export_detect(variables, cfg, batch_size=1, input_format="u16")


def test_export_u8_int8_engine(small_setup, tmp_path):
    """u8 input format composes with the int8 engine export: uint8
    signature, int8 graph, equals the live detect_int8_u8 path."""
    from detjax import quant

    cfg, variables, images = small_setup
    canvases = jnp.asarray(np.random.default_rng(22).integers(
        0, 256, (2, 64, 64, 3), np.uint8))
    path = str(tmp_path / "detect_int8_u8.stablehlo")
    save_detect(path, variables, cfg, batch_size=2, calibration=images,
                input_format="u8")
    served = load_detect(path)
    assert served.in_dtype == jnp.uint8
    out = served(canvases)
    qtree = quant.quantize_model(variables, cfg, images)
    ref = quant.detect_int8_u8(qtree, canvases, cfg)
    np.testing.assert_array_equal(np.asarray(out.num_valid),
                                  np.asarray(ref.num_valid))
    np.testing.assert_allclose(np.asarray(out.scores),
                               np.asarray(ref.scores), rtol=1e-3, atol=1e-4)
