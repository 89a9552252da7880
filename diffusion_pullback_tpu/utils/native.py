"""ctypes bindings for the native image-preprocessing library.

Builds native/libdpximg.so on first use if the toolchain is available
(g++ is baked into the image); every consumer degrades to the pure-Python
path when the library can't be built/loaded, so the framework stays fully
functional without native code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdpximg.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.dpx_crop_resize_normalize.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ]
        lib.dpx_batch_to_grid_u8.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p,
        ]
        lib.dpx_version.restype = ctypes.c_int
        if hasattr(lib, "dpx_decode_crop_resize"):
            lib.dpx_has_codecs.restype = ctypes.c_int
            lib.dpx_decode_crop_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_int, f32p,
            ]
            lib.dpx_decode_crop_resize.restype = ctypes.c_int
            lib.dpx_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                f32p, ctypes.POINTER(ctypes.c_int),
            ]
            lib.dpx_decode_batch.restype = ctypes.c_int
        if hasattr(lib, "dpx_basis_write"):
            lib.dpx_basis_write.argtypes = [
                ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int,
                f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
            ]
            lib.dpx_basis_write.restype = ctypes.c_int
            lib.dpx_basis_read_header.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ]
            lib.dpx_basis_read_header.restype = ctypes.c_int
        _lib = lib
        return _lib


def crop_resize_normalize(img_u8: np.ndarray, out_size: int) -> Optional[np.ndarray]:
    """uint8 HWC → f32 (out,out,C) in [-1,1] via the native lib; None if
    unavailable (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, c = img_u8.shape
    out = np.empty((out_size, out_size, c), np.float32)
    lib.dpx_crop_resize_normalize(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_size,
    )
    return out


def batch_to_grid(batch_f32: np.ndarray, nrow: int) -> Optional[np.ndarray]:
    """[-1,1] NHWC f32 → uint8 grid; None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    batch_f32 = np.ascontiguousarray(batch_f32, np.float32)
    n, h, w, c = batch_f32.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.empty((ncol * h, nrow * w, c), np.uint8)
    lib.dpx_batch_to_grid_u8(
        batch_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, h, w, c, nrow,
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return grid


def has_codecs() -> bool:
    """True when the library was built against libjpeg/libpng and owns the
    full decode → crop/resize/normalize path."""
    lib = get_lib()
    return bool(
        lib is not None
        and hasattr(lib, "dpx_has_codecs")
        and lib.dpx_has_codecs()
    )


def decode_crop_resize(path: str, out_size: int) -> Optional[np.ndarray]:
    """Fully-native image load: decode (libjpeg/libpng) + center-crop +
    bilinear resize + [-1,1] normalize → (out,out,3) f32. None on any
    failure (unsupported codec/colorspace; caller falls back to PIL)."""
    lib = get_lib()
    if lib is None or not has_codecs():
        return None
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = lib.dpx_decode_crop_resize(
        path.encode(), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def decode_batch(paths, out_size: int):
    """Threaded batch load: (n, out, out, 3) f32 plus a per-item ok mask —
    one decode worker per hardware thread in C++ (the reference decodes
    serially through PIL per __getitem__). None if the native codecs are
    unavailable; failed items are flagged for a PIL patch-up, not fatal."""
    lib = get_lib()
    if lib is None or not has_codecs():
        return None
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    status = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dpx_decode_batch(
        arr, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, status == 0


_BASIS_HEADER_BYTES = 32


def basis_write(path: str, u: np.ndarray, s: np.ndarray,
                vT: np.ndarray) -> bool:
    """Atomic fsync'd write of one basis triplet in the native mmap format
    (native/basisstore.cpp). False if the lib is unavailable or the write
    failed (caller falls back to npz)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dpx_basis_write"):
        return False
    u = np.ascontiguousarray(u, np.float32)
    s = np.ascontiguousarray(s, np.float32)
    vT = np.ascontiguousarray(vT, np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.dpx_basis_write(
        path.encode(),
        u.ctypes.data_as(f32p), u.shape[0], u.shape[1],
        s.ctypes.data_as(f32p), s.shape[0],
        vT.ctypes.data_as(f32p), vT.shape[0], vT.shape[1],
    )
    return rc == 0


def basis_read(path: str):
    """Zero-copy load of a native basis file: (u, s, vT) as read-only
    np.memmap views. None on any failure."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "dpx_basis_read_header"):
        return None
    dims = (ctypes.c_int * 5)()
    if lib.dpx_basis_read_header(path.encode(), dims) != 0:
        return None
    u0, u1, k, v0, v1 = (int(d) for d in dims)
    off = _BASIS_HEADER_BYTES
    u = np.memmap(path, np.float32, "r", offset=off, shape=(u0, u1))
    off += 4 * u0 * u1
    s = np.memmap(path, np.float32, "r", offset=off, shape=(k,))
    off += 4 * k
    vT = np.memmap(path, np.float32, "r", offset=off, shape=(v0, v1))
    return u, s, vT
