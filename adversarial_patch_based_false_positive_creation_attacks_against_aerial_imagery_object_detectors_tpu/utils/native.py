"""ctypes bindings for the native host-ops library (native/host_ops.cpp).

Auto-builds ``libhost_ops.so`` with g++ on first use (cached); every
entry point has a numpy fallback, so the framework works without a
toolchain. Set ``APFP_NATIVE=0`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhost_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "host_ops.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("APFP_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.iou_xywh_matrix.argtypes = [f32p, ctypes.c_int64, f32p,
                                    ctypes.c_int64, f32p]
    lib.greedy_nms.restype = ctypes.c_int64
    lib.greedy_nms.argtypes = [f32p, f32p, ctypes.c_int64,
                               ctypes.c_float, i64p]
    lib.interference_map.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                     ctypes.c_int64, f32p]
    lib.parse_floats.restype = ctypes.c_int64
    lib.parse_floats.argtypes = [ctypes.c_char_p, ctypes.c_int64, f32p,
                                 ctypes.c_int64]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return get_lib() is not None


def iou_xywh_matrix(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    out = np.empty((len(a), len(b)), np.float32)
    lib.iou_xywh_matrix(_fptr(a), len(a), _fptr(b), len(b), _fptr(out))
    return out


def greedy_nms(boxes: np.ndarray, scores: np.ndarray,
               iou_thresh: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(scores), np.int64)
    n = lib.greedy_nms(_fptr(boxes), _fptr(scores), len(scores),
                       ctypes.c_float(iou_thresh),
                       keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return keep[:n].copy()


def interference_map(labels: np.ndarray, semi_edge: float,
                     img_size: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.float32)
    out = np.empty(img_size * img_size, np.float32)
    lib.interference_map(_fptr(labels), len(labels),
                         ctypes.c_float(semi_edge), img_size, _fptr(out))
    return out.reshape(img_size, img_size)


def parse_floats(text: bytes, max_out: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(max_out, np.float32)
    n = lib.parse_floats(text, len(text), _fptr(out), max_out)
    return out[:n].copy()
