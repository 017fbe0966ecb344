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
    **overrides,
) -> "jax.export.Exported":
    """Export the fused detect step with ``variables`` baked in.

    With ``calibration`` (a normalized [N,H,W,3] image batch), the model is
    first PTQ-quantized (detjax/quant.py) and the INT8 engine's graph is
    exported instead — int8 weights and activation scales baked in — for
    the 2x-int8-MXU serving path.

    ``platforms=None`` lowers for the current default backend. Pass e.g.
    ``("tpu",)`` explicitly to cross-lower from a CPU host; note the Pallas
    NMS kernel is chosen by the trace-time default backend, so a cross-
    lowered artifact uses the (bit-identical) lax NMS path.
    """
    cfg = cfg if isinstance(cfg, Config) else get_config(cfg, **overrides)
    h, w = cfg.model.image_size

    if calibration is not None:
        from detjax.quant import _detect_int8_fn, quantize_model

        qtree = quantize_model(variables, cfg, jnp.asarray(calibration))
        run_q = _detect_int8_fn(cfg)
        fn = jax.jit(lambda images: run_q(qtree, images))
    else:
        run = _detect_fn(cfg)
        fn = jax.jit(lambda images: run(variables, images))
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    return jax.export.export(
        fn, platforms=list(platforms) if platforms else None)(spec)


def save_detect(path: str, variables, cfg: Config | str = "retinanet_r50_640",
                batch_size: int = 1,
                platforms: Optional[Sequence[str]] = None,
                calibration=None, **overrides) -> None:
    """Serialize an exported detect artifact to ``path`` (one file)."""
    exp = export_detect(variables, cfg, batch_size, platforms,
                        calibration=calibration, **overrides)
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_detect(path: str) -> Callable[[jax.Array], Detections]:
    """Load a serialized artifact → callable ``images -> Detections``.

    The returned callable is the rehydrated compiled module; wrap in
    ``jax.jit`` implicitly via ``.call`` (jax caches the executable).
    """
    with open(path, "rb") as f:
        exp = jax.export.deserialize(f.read())
    return exp.call
