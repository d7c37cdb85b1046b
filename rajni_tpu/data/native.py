"""ctypes loader for the native C++ preprocessing library.

Builds ``_native/preprocess.cpp`` into a shared library on first use (cached
next to the source; rebuilt when the source is newer) and exposes
:func:`preprocess_native` with the same GEOMETRY as
:func:`rajni_tpu.data.pipeline.preprocess` (shared
``resize_crop_geometry``) but double-precision resampling where PIL uses
8-bit fixed-point coefficients — values agree within ±1/255 per channel
(pinned by tests/test_native.py), not bit-exactly. The ctypes call
releases the GIL, so the DataLoader's decode thread pool scales across
cores.

Set ``RAJNI_NATIVE=0`` to force the pure-PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "libpreprocess.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("RAJNI_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.rajni_preprocess.restype = ctypes.c_int
            lib.rajni_preprocess.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # src
                ctypes.c_int, ctypes.c_int,        # h, w
                ctypes.c_int, ctypes.c_int,        # nh, nw
                ctypes.c_int,                      # crop
                ctypes.c_int, ctypes.c_int,        # left, top
                ctypes.POINTER(ctypes.c_float),    # mean
                ctypes.POINTER(ctypes.c_float),    # std
                ctypes.POINTER(ctypes.c_float),    # out
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _load_failed = True
            return None
    return _lib


def available() -> bool:
    return load() is not None


def preprocess_native(
    rgb: np.ndarray,
    img_size: int,
    resize: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> np.ndarray:
    """Native resize(shorter-side, bicubic) + center-crop + normalize.

    Args:
      rgb: ``[H, W, 3] uint8`` decoded image.
      img_size / resize: crop size / shorter-side target (reference
        run.py:62-70 defaults 224 / 256).
    Returns:
      ``[img_size, img_size, 3] float32`` normalized, NHWC.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native preprocessing unavailable")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    # the shared parity-critical geometry (int-truncated long side,
    # banker's-rounded crop offsets — pipeline.resize_crop_geometry)
    from .pipeline import resize_crop_geometry

    nw, nh, left, top = resize_crop_geometry(w, h, img_size, resize)

    out = np.empty((img_size, img_size, 3), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    rc = lib.rajni_preprocess(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, nh, nw, img_size, left, top,
        mean32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"rajni_preprocess failed with code {rc}")
    return out
