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


def load_variables(preset: str, ckpt_dir: str,
                   overrides: Optional[dict] = None):
    """Build the preset config and restore inference variables from the
    latest checkpoint → ``(cfg, {"params", "batch_stats"})``."""
    import jax

    from detjax.config import get_config
    from detjax.train import make_train_state
    from detjax.train.checkpoint import Checkpointer

    cfg = get_config(preset, **(overrides or {}))
    state = make_train_state(cfg, jax.random.PRNGKey(0))
    state = Checkpointer(ckpt_dir).restore(state)
    return cfg, {"params": state.params, "batch_stats": state.batch_stats}
