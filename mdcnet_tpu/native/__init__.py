"""ctypes bindings for the native (C++) data-IO tier.

The TPU compute path is jax/XLA/pallas; this package is the CPU-side native
tier: batched synthetic-defect rendering, uint8 bilinear resize, and box
scaling (dataio.cc).  The library is built on demand with g++ (no
pybind11 in this image); every entry point has a numpy fallback so the
framework works without a toolchain.

Usage:
    from mdcnet_tpu import native
    if native.available():
        imgs = native.render_defects(labels, boxes, seeds, size)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmdcdataio.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    # -O3 without -march=native: the artifact may outlive the build host
    # (a SIGILL on an older microarch is worse than a few % of throughput).
    src = os.path.join(_DIR, "dataio.cc")
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                        src, "-o", _SO], check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _stale() -> bool:
    """True when dataio.cc is newer than the built library."""
    try:
        return os.path.getmtime(os.path.join(_DIR, "dataio.cc")) \
            > os.path.getmtime(_SO)
    except OSError:
        return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO) or _stale()) and not _build():
        if not os.path.exists(_SO):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.mdc_render_defects.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.mdc_resize_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32]
    lib.mdc_scale_boxes.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def render_defects(labels: np.ndarray, boxes: np.ndarray, seeds: np.ndarray,
                   size: int) -> np.ndarray:
    """Batched class+box-conditioned defect rendering (native fast path).

    labels: (N,) class indices 0..9; boxes: (N, 4) xyxy in image space;
    seeds: (N,) uint64.  Returns (N, size, size, 3) uint8.  Same visual
    statistics as data/synthetic.render_defect_image; noise stream differs
    (xorshift vs PCG64) — the python renderer stays the deterministic
    reference.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    labels = np.ascontiguousarray(labels, np.int32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    seeds = np.ascontiguousarray(seeds, np.uint64)
    n = labels.shape[0]
    out = np.empty((n, size, size, 3), np.uint8)
    lib.mdc_render_defects(
        _ptr(labels, ctypes.c_int32), _ptr(boxes, ctypes.c_float),
        _ptr(seeds, ctypes.c_uint64), n, size, _ptr(out, ctypes.c_uint8))
    return out


def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """uint8 HWC bilinear resize (align_corners=False, cv2/PIL convention)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    assert c == 3, img.shape
    out = np.empty((oh, ow, 3), np.uint8)
    lib.mdc_resize_bilinear(_ptr(img, ctypes.c_uint8), h, w,
                            _ptr(out, ctypes.c_uint8), oh, ow)
    return out


def scale_boxes(boxes: np.ndarray, src_w: float, src_h: float, dst: float,
                min_side: float = 2.0) -> np.ndarray:
    """Vectorized scale_box_to_image (data/synthetic.py semantics)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    boxes = np.ascontiguousarray(boxes, np.float32)
    out = np.empty_like(boxes)
    lib.mdc_scale_boxes(_ptr(boxes, ctypes.c_float), boxes.shape[0],
                        src_w, src_h, dst, min_side,
                        _ptr(out, ctypes.c_float))
    return out
