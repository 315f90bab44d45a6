"""ctypes binding for the native video-preprocessing library
(``native/videoproc.cpp``).

Builds the shared library on first use with g++ (cached next to the
source), and exposes:

- ``fused_preprocess``: uint8 [T, H, W, 3] -> normalized float32 crop in
  ONE pass (resize + crop + flip + normalize), multithreaded over frames;
- ``resize_bilinear``: plain resize (testing/parity entry).

Falls back cleanly when the toolchain is unavailable (``AVAILABLE`` False);
``transform.spatial_sampling_fused`` dispatches accordingly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB = None
AVAILABLE = None

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "videoproc.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libvideoproc.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def _load():
    global _LIB, AVAILABLE
    with _LOCK:
        if AVAILABLE is not None:
            return _LIB
        so = _build()
        if so is None:
            AVAILABLE = False
            return None
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.vp_fused_preprocess.restype = ctypes.c_int
        lib.vp_fused_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,   # frames, T, H, W
            ctypes.c_int, ctypes.c_int,                       # new_h, new_w
            ctypes.c_int, ctypes.c_int,                       # crop_y, crop_x
            ctypes.c_int, ctypes.c_int,                       # crop_h, crop_w
            ctypes.c_int,                                     # flip
            f32p, f32p, f32p, ctypes.c_int,                   # mean, std, out, threads
        ]
        lib.vp_resize_bilinear.restype = ctypes.c_int
        lib.vp_resize_bilinear.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ]
        _LIB = lib
        AVAILABLE = True
        return _LIB


def available() -> bool:
    _load()
    return bool(AVAILABLE)


def fused_preprocess(
    frames: np.ndarray,
    new_h: int,
    new_w: int,
    crop_y: int,
    crop_x: int,
    crop_size: int,
    flip: bool,
    mean: List[float],
    std: List[float],
    n_threads: int = 4,
) -> np.ndarray:
    """uint8 [T, H, W, 3] -> float32 [T, crop, crop, 3]."""
    lib = _load()
    assert lib is not None, "native videoproc unavailable"
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, C = frames.shape
    assert C == 3
    out = np.empty((T, crop_size, crop_size, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    rc = lib.vp_fused_preprocess(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, new_h, new_w, crop_y, crop_x, crop_size, crop_size,
        int(flip),
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    assert rc == 0, f"vp_fused_preprocess failed: {rc}"
    return out


def resize_bilinear(frames: np.ndarray, new_h: int, new_w: int,
                    n_threads: int = 4) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native videoproc unavailable"
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, C = frames.shape
    out = np.empty((T, new_h, new_w, 3), np.float32)
    rc = lib.vp_resize_bilinear(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, new_h, new_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    assert rc == 0, f"vp_resize_bilinear failed: {rc}"
    return out
