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
_JPEG_SRC = os.path.join(os.path.dirname(__file__), "detjax_jpeg.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_jpeg_lib: Optional[ctypes.CDLL] = None
_jpeg_failed = False


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


def _build_jpeg() -> Optional[ctypes.CDLL]:
    """Separate .so: links the system libjpeg; isolated so its absence
    never takes down the rest of the native layer."""
    with open(_JPEG_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"detjax_jpeg_{tag}.so")
    if not os.path.exists(so_path):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "detjax_jpeg.so")
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-o", tmp, _JPEG_SRC, "-ljpeg"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    i64 = ctypes.c_int64
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.detjax_jpeg_info.argtypes = [pu8, i64, pi64, pi64]
    lib.detjax_jpeg_info.restype = i64
    lib.detjax_jpeg_decode.argtypes = [pu8, i64, pu8, i64]
    lib.detjax_jpeg_decode.restype = i64
    return lib


def _get_jpeg() -> Optional[ctypes.CDLL]:
    global _jpeg_lib, _jpeg_failed
    if _jpeg_lib is not None or _jpeg_failed:
        return _jpeg_lib
    with _lock:
        if _jpeg_lib is None and not _jpeg_failed:
            try:
                _jpeg_lib = _build_jpeg()
            except Exception:
                _jpeg_failed = True
    return _jpeg_lib


def jpeg_available() -> bool:
    return _get_jpeg() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes → [H, W, 3] uint8 RGB via in-repo libjpeg binding.

    Returns None when the native path is unavailable or the payload isn't
    a decodable JPEG (caller falls back to PIL). The C call releases the
    GIL, so decoder threads scale on multi-core hosts.
    """
    lib = _get_jpeg()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = np.zeros(1, np.int64)
    w = np.zeros(1, np.int64)
    if lib.detjax_jpeg_info(buf, len(buf), h, w):
        return None
    out = np.empty((int(h[0]), int(w[0]), 3), np.uint8)
    if lib.detjax_jpeg_decode(buf, len(buf), out.reshape(-1), out.size):
        return None
    return out


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
    """uint8 [H,W,C] → [dh,dw,C], bit-identical to PIL Image.BILINEAR
    (antialiased triangle filter, Pillow 8bpc fixed-point arithmetic)."""
    lib = _get()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    out = np.empty((dh, dw, c), np.uint8)
    lib.detjax_resize_bilinear_u8(src, h, w, c, out, dh, dw)
    return out
