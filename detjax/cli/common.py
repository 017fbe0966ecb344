"""Shared CLI plumbing: `--set group.field=value` override parsing and
checkpoint → inference-variables loading (used by detect/eval/export/
serve; train has its own state lifecycle)."""

from __future__ import annotations

import ast
from typing import Optional


def parse_overrides(pairs) -> dict:
    """['a.b=1', 'c.d=(2,3)'] → {'a.b': 1, 'c.d': (2, 3)} (literals when
    they parse, raw strings otherwise)."""
    out = {}
    for p in pairs or []:
        key, _, val = p.partition("=")
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val
    return out


def load_calibration_batch(image_paths, cfg, normalize: bool = True):
    """Decode + letterbox image files into an [N,H,W,3] PTQ-calibration
    batch (detjax-export / detjax-serve --int8-calibrate): normalized fp32
    by default (what ``quantize_model`` takes), or raw uint8 canvases with
    ``normalize=False`` (what ``DetectionServer(calibration=...)`` takes —
    it normalizes internally)."""
    import numpy as np
    from PIL import Image

    from detjax.data.transforms import letterbox

    canvases = []
    for p in image_paths:
        img = np.asarray(Image.open(p).convert("RGB"), np.uint8)
        canvas, _, _ = letterbox(img, np.zeros((0, 4), np.float32),
                                 cfg.model.image_size)
        canvases.append(canvas)
    stacked = np.stack(canvases)
    if not normalize:
        return stacked

    import jax
    import jax.numpy as jnp

    from detjax.data.pipeline import device_augment

    batch, _ = device_augment(
        jnp.asarray(stacked),
        jnp.zeros((len(canvases), 1, 4), jnp.float32),
        jax.random.PRNGKey(0), hflip_prob=0.0,
        mean=cfg.data.mean, std=cfg.data.std,
        out_dtype=cfg.model.dtype)
    return batch


def load_variables(preset: str, ckpt_dir: str,
                   overrides: Optional[dict] = None,
                   use_ema: bool = False):
    """Build the preset config and restore inference variables from the
    latest checkpoint → ``(cfg, {"params", "batch_stats"})``.

    ``use_ema``: serve the EMA shadow params (requires a checkpoint
    written with ``train.ema_decay > 0``; pass the same override here so
    the restore template carries the EMA subtree)."""
    import jax

    from detjax.config import get_config
    from detjax.train import make_train_state
    from detjax.train.checkpoint import Checkpointer

    cfg = get_config(preset, **(overrides or {}))
    if use_ema and cfg.train.ema_decay <= 0:
        raise ValueError(
            "--ema needs train.ema_decay>0: pass the same "
            "--set train.ema_decay=... the checkpoint was trained with, "
            "so the restore template carries the EMA subtree")
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    try:
        state = Checkpointer(ckpt_dir).restore(state)
    except Exception as e:
        if use_ema:
            # the most common failure here: the checkpoint predates EMA
            # (no ema_params item) so Orbax raises a raw tree-structure
            # mismatch — surface the actionable cause
            raise ValueError(
                f"--ema restore from {ckpt_dir!r} failed — was this "
                f"checkpoint trained with train.ema_decay>0? A pre-EMA "
                f"checkpoint has no ema_params subtree to restore") from e
        raise
    if use_ema:
        from detjax.train.step import ema_variables

        return cfg, ema_variables(state)
    return cfg, {"params": state.params, "batch_stats": state.batch_stats}
