"""Structured metrics logging (SURVEY.md §5.5).

The reference prints running cls/reg loss per iteration and the COCOeval
table per epoch. Here every step's metrics dict goes to a JSONL file (one
object per line, machine-parsable) plus a compact stdout line every
``print_every`` steps; eval results are logged as distinct ``kind="eval"``
records. TensorBoard is optional (``tensorboard=True`` writes tf.summary
scalars alongside, using the installed tf) — the JSONL remains the source
of truth and trivially importable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


def _to_py(v: Any) -> Any:
    """Device array / numpy scalar → Python float/int for JSON."""
    try:
        import numpy as np

        if hasattr(v, "item"):
            return v.item()
        if isinstance(v, (np.ndarray,)):
            return np.asarray(v).tolist()
    except Exception:
        pass
    return v


class MetricsLogger:
    """JSONL metrics writer with periodic stdout summaries."""

    def __init__(self, log_dir: Optional[str] = None, print_every: int = 50,
                 stream=None, tensorboard: bool = False):
        self.print_every = print_every
        self.stream = stream if stream is not None else sys.stdout
        self._fh = None
        self._tb = None
        if tensorboard and not log_dir:
            print("[logging] tensorboard requested but no log_dir set; "
                  "nothing will be written", file=self.stream)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                            buffering=1)
            if tensorboard:
                try:  # tf is present in this env (SURVEY.md §7) but optional
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(log_dir, "tb"))
                except Exception:
                    print("[logging] tensorboard requested but tf.summary "
                          "unavailable; JSONL only", file=self.stream)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], kind: str = "train"):
        rec = {"kind": kind, "step": int(step),
               "time": round(time.time() - self._t0, 3)}
        rec.update({k: _to_py(v) for k, v in metrics.items()})
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in rec.items():
                    if isinstance(v, (int, float)) and k not in ("step",):
                        tf.summary.scalar(f"{kind}/{k}", v, step=int(step))
        if kind != "train" or (self.print_every and step % self.print_every == 0):
            keys = [k for k in rec if k not in ("kind", "step", "time")]
            body = " ".join(
                f"{k}={rec[k]:.4f}" if isinstance(rec[k], float) else f"{k}={rec[k]}"
                for k in keys)
            print(f"[{kind}] step={step} {body}", file=self.stream)

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
