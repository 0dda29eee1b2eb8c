"""ctypes binding for the native host loader (native/hostloader.cpp).

Builds on first use (g++, cached .so next to the source) and exposes
`load_canvas_batch(paths, canvas, threads)`; callers fall back to the
cv2 path when the toolchain or libjpeg is unavailable, or for non-JPEG
files (the native decoder only handles JPEG — the dominant format for
MPII/COCO).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           '..', '..', 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libhostloader.so')
_lock = threading.Lock()
_lib = None
_unavailable = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, 'hostloader.cpp')
    if not os.path.isfile(src):
        return False
    # compile to a unique temp path, then atomically rename: two
    # processes building concurrently (the 2-process jax.distributed
    # test, multiple trainers on one host) must never dlopen a
    # half-written .so
    tmp = f'{_LIB_PATH}.tmp{os.getpid()}'
    try:
        subprocess.run(
            ['g++', '-O3', '-fPIC', '-shared', '-std=c++17',
             '-o', tmp, src, '-ljpeg', '-lpthread'],
            check=True, capture_output=True, timeout=120)
        os.rename(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _unavailable
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        if not os.path.isfile(_LIB_PATH) and not _build():
            _unavailable = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _unavailable = True
            return None
        lib.hl_load_canvas_batch.restype = ctypes.c_int
        lib.hl_load_canvas_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        if not hasattr(lib, 'hl_load_region_batch') or lib.hl_version() < 4:
            # stale .so from a previous build: rebuild once
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            if not _build():
                _unavailable = True
                return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.hl_load_canvas_batch.restype = ctypes.c_int
        lib.hl_load_region_batch.restype = ctypes.c_int
        lib.hl_load_region_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),   # cx
            ctypes.POINTER(ctypes.c_float),   # cy
            ctypes.POINTER(ctypes.c_float),   # side
            ctypes.POINTER(ctypes.c_ubyte),   # out
            ctypes.POINTER(ctypes.c_float),   # q
            ctypes.POINTER(ctypes.c_float),   # ox
            ctypes.POINTER(ctypes.c_float),   # oy
            ctypes.POINTER(ctypes.c_float),   # widths
            ctypes.POINTER(ctypes.c_float),   # heights
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_canvas_batch(paths: List[str], canvas: int, threads: int = 0
                      ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                          np.ndarray, np.ndarray]]:
    """Decode+resize+pad a batch of JPEGs natively.

    Returns (canvases [N,c,c,3] u8, canvas_scale [N], widths [N],
    ok_mask [N] bool) or None if the library is unavailable. Failed
    decodes have scale 0 (caller falls back per-slot). The C ABI also
    fills per-image heights, but only widths is surfaced: the sole
    geometry consumer is the MPII flip (x -> width - x - 1); extend the
    tuple if a height consumer ever appears.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, canvas, canvas, 3), np.uint8)
    scales = np.zeros((n,), np.float32)
    widths = np.zeros((n,), np.float32)
    heights = np.zeros((n,), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if threads <= 0:
        threads = min(8, os.cpu_count() or 1)
    lib.hl_load_canvas_batch(
        arr, n, canvas, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out, scales, widths, scales > 0


def load_region_batch(paths: List[str], canvas: int, centers: np.ndarray,
                      sides: np.ndarray, threads: int = 0):
    """Crop-aware native packing: decode each JPEG and place the
    side x side region around `center` into the canvas at native
    resolution (q=1) when it fits, else downscaled by canvas/side.

    Returns (canvases [N,c,c,3] u8, q [N], offsets [N,2] (ox, oy),
    widths [N], ok [N]) or None if the library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    centers = np.ascontiguousarray(np.asarray(centers, np.float32))
    cx = np.ascontiguousarray(centers[:, 0])
    cy = np.ascontiguousarray(centers[:, 1])
    sides = np.ascontiguousarray(np.asarray(sides, np.float32))
    out = np.zeros((n, canvas, canvas, 3), np.uint8)
    q = np.zeros((n,), np.float32)
    ox = np.zeros((n,), np.float32)
    oy = np.zeros((n,), np.float32)
    widths = np.zeros((n,), np.float32)
    heights = np.zeros((n,), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if threads <= 0:
        threads = min(8, os.cpu_count() or 1)
    f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.hl_load_region_batch(
        arr, n, canvas, threads, f32p(cx), f32p(cy), f32p(sides),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        f32p(q), f32p(ox), f32p(oy), f32p(widths), f32p(heights))
    return out, q, np.stack([ox, oy], axis=-1), widths, q > 0
