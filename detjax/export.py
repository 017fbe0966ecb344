"""Serving export: the fused detect step as a portable StableHLO artifact.

The reference's deployment artifact is a whole-module torch pickle
(SURVEY.md §5.4 — ``torch.save(model, ...)``), which requires the exact
model code (and Python) on the serving host. The TPU-native equivalent is a
compiled, weights-baked StableHLO module via ``jax.export``: the serving
host needs only jax (any version that can deserialize the artifact — the
format is versioned and stable), no detjax model code, and the module runs
through XLA on TPU or CPU. Postprocessing (decode → clip → class-aware NMS
→ top-k) is inside the artifact, so serving never leaves the chip.

Weights are baked in as constants (like the reference's pickle, but
code-free); images are the only runtime input. The artifact is specialized
to one (batch_size, image_size, num_classes) — static shapes are what make
the TPU path fast, and a server picks one batch shape anyway.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from detjax.config import Config, get_config
from detjax.modeling import _detect_fn
from detjax.ops.nms import Detections

jax.export.register_namedtuple_serialization(
    Detections, serialized_name="detjax.ops.nms.Detections")


def export_detect(
    variables,
    cfg: Config | str = "retinanet_r50_640",
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
    calibration=None,
    input_format: str = "fp32",
    calib_mode: str = "absmax",
    **overrides,
) -> "jax.export.Exported":
    """Export the fused detect step with ``variables`` baked in.

    With ``calibration`` (a normalized [N,H,W,3] image batch), the model is
    first PTQ-quantized (detjax/quant.py) and the INT8 engine's graph is
    exported instead — int8 weights and activation scales baked in — for
    the 2x-int8-MXU serving path.

    ``input_format``: ``"fp32"`` takes normalized [B,H,W,3] fp32 images;
    ``"u8"`` takes RAW uint8 letterboxed canvases and fuses the
    ``cfg.data.mean/std`` normalization into the artifact itself — the
    serving-host analog of :func:`detjax.modeling.detect_u8` (one dispatch,
    4× fewer H2D bytes, no normalize graph on the host). The input
    signature is self-describing: loaders read the baked dtype back via
    :func:`load_detect`'s ``in_dtype``.

    ``platforms=None`` lowers for the current default backend. Pass e.g.
    ``("tpu",)`` explicitly to cross-lower from a CPU host; note the Pallas
    NMS kernel is chosen by the trace-time default backend, so a cross-
    lowered artifact uses the (bit-identical) lax NMS path.
    """
    cfg = cfg if isinstance(cfg, Config) else get_config(cfg, **overrides)
    if input_format not in ("fp32", "u8"):
        raise ValueError(f"input_format must be 'fp32' or 'u8', "
                         f"got {input_format!r}")
    h, w = cfg.model.image_size

    if calibration is not None:
        from detjax.quant import _detect_int8_fn, quantize_model

        qtree = quantize_model(variables, cfg, jnp.asarray(calibration),
                               calib_mode=calib_mode)
        run_q = _detect_int8_fn(cfg)
        fn = jax.jit(lambda images: run_q(qtree, images))
    else:
        run = _detect_fn(cfg)
        fn = jax.jit(lambda images: run(variables, images))
    if input_format == "u8":
        from detjax.data.pipeline import normalize_u8

        mean = tuple(cfg.data.mean)
        std = tuple(cfg.data.std)
        dtype = cfg.model.dtype
        base = fn

        @jax.jit
        def fn(canvases_u8):
            return base(normalize_u8(canvases_u8, mean, std, dtype))

    in_dtype = jnp.uint8 if input_format == "u8" else jnp.float32
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), in_dtype)
    return jax.export.export(
        fn, platforms=list(platforms) if platforms else None)(spec)


def save_detect(path: str, variables, cfg: Config | str = "retinanet_r50_640",
                batch_size: int = 1,
                platforms: Optional[Sequence[str]] = None,
                calibration=None, input_format: str = "fp32",
                calib_mode: str = "absmax",
                **overrides) -> None:
    """Serialize an exported detect artifact to ``path`` (one file)."""
    exp = export_detect(variables, cfg, batch_size, platforms,
                        calibration=calibration, input_format=input_format,
                        calib_mode=calib_mode, **overrides)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_detect(path: str) -> Callable[[jax.Array], Detections]:
    """Load a serialized artifact → callable ``images -> Detections``.

    The returned callable is the rehydrated compiled module; wrap in
    ``jax.jit`` implicitly via ``.call`` (jax caches the executable). The
    artifact's baked input signature is exposed on the callable as
    ``in_dtype`` / ``in_shape`` (uint8 ⇔ exported with
    ``input_format="u8"`` — raw canvases, normalization inside), so hosts
    can feed it without out-of-band metadata.
    """
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())

    aval = exp.in_avals[0]
    in_dtype = jnp.dtype(aval.dtype)

    def run(images):
        # the artifact's input signature is baked; callers legitimately
        # hold model-dtype (bf16) batches — bf16 → fp32 is exact, so cast
        # to the signature instead of erroring (uint8 artifacts still
        # reject float feeds: quantization there would hide a host bug)
        if (images.dtype != in_dtype
                and in_dtype == jnp.float32
                and jnp.issubdtype(images.dtype, jnp.floating)):
            images = images.astype(in_dtype)
        return exp.call(images)

    run.in_dtype = in_dtype
    run.in_shape = tuple(aval.shape)
    return run
