"""ctypes bindings for the native host-side preprocessing library.

Builds `native/libdwc_image_ops.so` on demand (g++ is in the image) and
exposes `preprocess_batch` — the fused crop+flip+resize+normalize kernel —
with a NumPy fallback of identical semantics (half-pixel bilinear) when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdwc_image_ops.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    # always invoke make (incremental, ~no-op when fresh) so image_ops.cpp
    # edits are never shadowed by a stale binary
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.dwc_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.dwc_normalize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dwc_omp_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


def _preprocess_one_numpy(img: np.ndarray, crop: int, out_size: int) -> np.ndarray:
    """Exact NumPy mirror of the C++ kernel's sampling: source coordinates
    are computed in the crop window but CLAMPED TO THE FULL IMAGE (so
    upscaling configs blend pixels just outside the crop, like the kernel)."""
    h, w, _ = img.shape
    top, left = (h - crop) // 2, (w - crop) // 2
    scale = crop / out_size
    sy = (np.arange(out_size) + 0.5) * scale - 0.5 + top
    sx = (np.arange(out_size) + 0.5) * scale - 0.5 + left
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]
    img = img.astype(np.float32)
    top_v = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot_v = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    return top_v * (1 - fy) + bot_v * fy


def preprocess_batch(images: np.ndarray, crop: int, out_size: int,
                     hflips: Optional[np.ndarray] = None,
                     force_fallback: bool = False) -> np.ndarray:
    """Fused center-crop + hflip + bilinear resize + [-1,1] normalize.

    images: [N, H, W, 3] uint8 (contiguous, same size); hflips: [N] 0/1.
    Returns [N, out_size, out_size, 3] float32.
    """
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    lib = None if force_fallback else load_library()
    if lib is not None:
        out = np.empty((n, out_size, out_size, 3), dtype=np.float32)
        flips_arr = None
        flips_ptr = None
        if hflips is not None:
            flips_arr = np.ascontiguousarray(hflips, dtype=np.int32)
            flips_ptr = flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        lib.dwc_preprocess_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, crop, out_size, flips_ptr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    # NumPy fallback with identical semantics (incl. full-image clamping)
    out = np.empty((n, out_size, out_size, 3), dtype=np.float32)
    for i in range(n):
        img = images[i]
        if hflips is not None and hflips[i]:
            # kernel flips by mirroring output x; flipping the source image
            # is equivalent when (w - crop) is even (centered window) — true
            # for CelebA (178-178); odd diffs shift sampling by one pixel
            img = np.ascontiguousarray(img[:, ::-1])
        out[i] = _preprocess_one_numpy(img, crop, out_size)
    return out / 127.5 - 1.0


def omp_threads() -> int:
    lib = load_library()
    return int(lib.dwc_omp_threads()) if lib is not None else 1
