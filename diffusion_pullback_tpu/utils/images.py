"""Image I/O: load → NHWC float in [-1, 1]; save grids as PNG.

Replaces the reference's torchvision transforms + tvu.save_image
(/root/reference/src/utils/utils.py:1440-1480 ImgDataset transforms,
edit.py:477-480 grid saving) with PIL + numpy; arrays are NHWC (TPU-native)
rather than torch NCHW.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def load_image(path: str, image_size: int) -> np.ndarray:
    """Center-crop to square, resize (bilinear), normalize to [-1, 1].
    → (1, S, S, 3). With codec support the ENTIRE path (libjpeg/libpng
    decode included) runs in the native C++ library
    (native/imageproc.cpp via utils.native); else native pixel math over a
    PIL decode; else pure PIL."""
    from . import native

    arr = native.decode_crop_resize(path, image_size)
    if arr is not None:
        return arr[None]

    if Image is None:
        raise RuntimeError("PIL is required for image loading")
    img = Image.open(path).convert("RGB")

    arr = native.crop_resize_normalize(np.asarray(img, np.uint8), image_size)
    if arr is not None:
        return arr[None]

    w, h = img.size
    side = min(w, h)
    left, top = (w - side) // 2, (h - side) // 2
    img = img.crop((left, top, left + side, top + side))
    img = img.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr * 2.0 - 1.0)[None]


def to_uint8(batch: np.ndarray) -> np.ndarray:
    """[-1, 1] NHWC floats → uint8 (the reference's x/2+0.5 clamp,
    edit.py:479)."""
    batch = np.asarray(batch, dtype=np.float32)
    return (np.clip(batch / 2 + 0.5, 0, 1) * 255).round().astype(np.uint8)


def save_image_grid(
    batch: np.ndarray, path: str, nrow: int | None = None, normalize: bool = True
) -> None:
    """Save an NHWC batch as a single grid PNG (tvu.save_image equivalent)."""
    if Image is None:
        raise RuntimeError("PIL is required for image saving")
    n = batch.shape[0]
    nrow = n if nrow is None else max(1, nrow)
    if normalize:
        from . import native

        grid = native.batch_to_grid(np.asarray(batch, np.float32), nrow)
    else:
        grid = None
    if grid is None:
        arr = to_uint8(batch) if normalize else np.asarray(batch, np.uint8)
        _, h, w, c = arr.shape
        ncol = math.ceil(n / nrow)
        grid = np.zeros((ncol * h, nrow * w, c), np.uint8)
        for i in range(n):
            r, col = divmod(i, nrow)
            grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = arr[i]
    c = grid.shape[-1]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid.squeeze() if c == 1 else grid).save(path)
