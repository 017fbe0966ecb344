"""Native host-side layer: lazy g++ build + ctypes bindings (SURVEY.md §2a).

Replaces the reference's host-side native dependencies with in-repo C++:
  * pycocotools' C/Cython evaluation core → ``match_image`` / ``iou_xyxy``
    (used by detjax.evaluation.coco_map as a fast path; ~10–30× faster
    than the numpy loops on large result sets, identical outputs)
  * cv2/PIL C image resize → ``resize_bilinear`` (data-loader hot path)

The shared library compiles on first use into a cache dir keyed by source
hash; if no toolchain is present everything silently falls back to the
numpy implementations (``available()`` → False). No pybind11 — plain C ABI
via ctypes, so the build needs nothing beyond g++.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "detjax_native.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    d = os.path.join(base, "detjax_native")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"detjax_native_{tag}.so")
    if not os.path.exists(so_path):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "detjax_native.so")
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-o", tmp, _SRC]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so_path)  # atomic vs concurrent builders
    lib = ctypes.CDLL(so_path)
    i64, f64, u8 = ctypes.c_int64, ctypes.c_double, ctypes.c_uint8
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.detjax_iou_xyxy.argtypes = [pd, i64, pd, i64, pu8, pd]
    lib.detjax_match_image.argtypes = [
        pd, pu8, pu8, pd, f64, f64, pd, i64, i64, i64, pi64, pu8]
    lib.detjax_resize_bilinear_u8.argtypes = [pu8, i64, i64, i64, pu8, i64, i64]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            try:
                _lib = _build()
            except Exception:
                _build_failed = True
    return _lib


def available() -> bool:
    return _get() is not None


def iou_xyxy(det: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """[D,4] × [G,4] xyxy → [D,G] IoU (crowd: inter/det_area)."""
    lib = _get()
    assert lib is not None
    det = np.ascontiguousarray(det, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    crowd = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.empty((len(det), len(gt)), np.float64)
    if out.size:
        lib.detjax_iou_xyxy(det, len(det), gt, len(gt), crowd, out)
    return out


def match_image(ious: np.ndarray, gt_ig: np.ndarray, g_crowd: np.ndarray,
                det_areas: np.ndarray, area_rng, iou_thrs: np.ndarray):
    """COCOeval greedy matching; returns (dtm [T,D] int64, dt_ig [T,D] bool)."""
    lib = _get()
    assert lib is not None
    d_n, g_n = ious.shape if ious.size else (len(det_areas), 0)
    t_n = len(iou_thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    dtm = np.zeros((t_n, d_n), np.int64)
    dt_ig = np.zeros((t_n, d_n), np.uint8)
    lib.detjax_match_image(
        ious, np.ascontiguousarray(gt_ig, np.uint8),
        np.ascontiguousarray(g_crowd, np.uint8),
        np.ascontiguousarray(det_areas, np.float64),
        float(area_rng[0]), float(area_rng[1]),
        np.ascontiguousarray(iou_thrs, np.float64),
        t_n, d_n, g_n, dtm, dt_ig)
    return dtm, dt_ig.astype(bool)


def resize_bilinear(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 [H,W,C] → [dh,dw,C] bilinear (half-pixel centers)."""
    lib = _get()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    out = np.empty((dh, dw, c), np.uint8)
    lib.detjax_resize_bilinear_u8(src, h, w, c, out, dh, dw)
    return out
