"""ctypes binding for the native C++ data ops (native/dataops.cpp).

Provides ``load_batch(paths, size)`` (JPEG/PNG decode + bilinear resize +
[-1,1] normalize, multithreaded) and ``preprocess_batch`` for raw uint8
arrays.  Falls back to the PIL path in fm3dgan.data.datasets when the shared
library is missing; ``ensure_built()`` compiles it with make/g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfm3ddataops.so")
_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if needed. Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fm3d_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.fm3d_load_batch.restype = ctypes.c_int
    lib.fm3d_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.fm3d_preprocess_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_batch(
    paths: Sequence[str], size: int = 256, n_threads: int = 4
) -> np.ndarray:
    """Decode+resize+normalize a batch of image files -> [N,size,size,3]
    float32 in [-1,1].  Raises on decode failure; falls back to PIL when the
    native lib is unavailable."""
    lib = _get_lib()
    n = len(paths)
    if lib is None:
        from fm3dgan.data.datasets import default_transform, load_image

        t = default_transform(size)
        return np.stack([load_image(p, t) for p in paths])
    out = np.empty((n, size, size, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.fm3d_load_batch(
        arr, n, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out


def preprocess_batch(
    images: np.ndarray, size: int = 256, n_threads: int = 4
) -> np.ndarray:
    """uint8 [N,H,W,3] -> float32 [N,size,size,3] in [-1,1]."""
    lib = _get_lib()
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    if lib is None:
        x = images.astype(np.float32) / 255.0 * 2.0 - 1.0
        if h != size or w != size:
            raise NotImplementedError("resize fallback requires PIL path")
        return x
    out = np.empty((n, size, size, 3), np.float32)
    lib.fm3d_preprocess_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n,
        h,
        w,
        size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out
