"""Public API mirroring the reference surface: model build / train step /
detect (BASELINE.json north star; SURVEY.md §0.11). Filled in as the model
stack lands; signatures are stable from day one."""

from __future__ import annotations

from typing import Any, Tuple


def build_model(preset: str, rng: Any = None, **overrides):
    """Build a model + initial params for a named preset.

    Mirrors the reference's ``model = resnet50(num_classes, pretrained)``
    (SURVEY.md §3.5) as a functional (module, params) pair.
    """
    from detjax.modeling import build_model as _impl

    return _impl(preset, rng, **overrides)


def make_train_state(preset: str, rng: Any = None, **overrides):
    from detjax.train.step import make_train_state as _impl

    return _impl(preset, rng, **overrides)


def train_step(state, batch):
    """One jitted optimization step. Mirrors the reference's inner loop
    (SURVEY.md §3.1 hot loop) as a pure function of (state, batch)."""
    from detjax.train.step import train_step as _impl

    return _impl(state, batch)


def detect(params, images, preset: str = "retinanet_r50_640", **overrides):
    """End-to-end inference: images → (boxes, scores, labels), fused on-chip
    decode + class-aware NMS (SURVEY.md §3.2 TPU replacement)."""
    from detjax.modeling import detect as _impl

    return _impl(params, images, preset, **overrides)
