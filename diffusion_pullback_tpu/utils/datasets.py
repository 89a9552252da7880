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
import sys
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

    def load_batch(self, indices=None) -> np.ndarray:
        """(n, S, S, 3) batch via the native threaded decode pipeline (one
        libjpeg/libpng worker per hardware thread — the reference decodes
        serially through PIL per item); any item the codecs can't handle is
        patched up through the single-image path."""
        from .native import decode_batch

        idxs = range(len(self)) if indices is None else indices
        paths = [self.files[i] for i in idxs]
        res = decode_batch(paths, self.image_size)
        if res is None:
            return np.concatenate([load_image(p, self.image_size)
                                   for p in paths], axis=0)
        out, ok = res
        for j, good in enumerate(ok):
            if not good:
                out[j] = load_image(paths[j], self.image_size)[0]
        return out


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
    # last resort for the two reference-bundled sets: regenerate the
    # deterministic synthetic stand-ins (scripts/make_sample_images.py —
    # same files this repo commits under datasets/) into a cache dir, so
    # the published scripts/*.sh run even from a stripped checkout
    if dataset_name.lower() in ("celeba_hq", "examples"):
        gen_root = os.path.join(
            os.path.expanduser("~"), ".cache", "diffusion_pullback_tpu",
            "datasets")
        sys.path.insert(0, os.path.join(here, "scripts"))
        try:
            from make_sample_images import generate
        finally:
            sys.path.pop(0)
        generate(gen_root)
        print(f"[datasets] {dataset_name!r} folder missing — using the "
              f"generated synthetic sample set under {gen_root}")
        return ImgDataset(os.path.join(gen_root, dataset_name.lower()),
                          image_size)
    raise FileNotFoundError(
        f"dataset {dataset_name!r} not found (searched {candidates}); "
        "use dataset_name='noise' for offline runs or pass data_root"
    )


class BenchmarkDataset:
    """Reference BenchmarkDataset (utils.py:1409-1438): a
    raw_images/{train,test}/images folder of integer-named images,
    stretch-resized (NO center crop — unlike ImgDataset) to img_size and
    normalized to [-1, 1]; items are (1, S, S, 3) NHWC."""

    EXTS = ("jpg", "jpeg", "png")

    def __init__(self, image_root: str, img_size: int = 256,
                 is_train: bool = True):
        split = "train" if is_train else "test"
        self.image_dir = os.path.join(image_root, "raw_images", split,
                                      "images")
        names = [n for n in os.listdir(self.image_dir)
                 if n.split(".")[-1].lower() in self.EXTS]
        self.files = sorted(names, key=lambda n: int(n.split(".")[0]))
        if not self.files:
            raise FileNotFoundError(f"no images under {self.image_dir}")
        self.img_size = img_size

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        from PIL import Image

        img = Image.open(os.path.join(self.image_dir, self.files[idx]))
        img = img.convert("RGB").resize((self.img_size, self.img_size))
        arr = np.asarray(img, np.float32) / 255.0
        return (arr * 2.0 - 1.0)[None]


class HFDataset:
    """Local HuggingFace `datasets` folder (e.g. flowers-102) — reference
    HFDataset (utils.py:1371-1438). Zero-egress: only `load_from_disk`
    paths are supported; missing data raises a clear error."""

    def __init__(self, path: str, image_size: int, image_key: str = "image"):
        try:
            import datasets as hfds
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("the `datasets` package is required") from e
        self.ds = hfds.load_from_disk(path)
        if hasattr(self.ds, "keys"):  # DatasetDict → first split
            self.ds = self.ds[list(self.ds.keys())[0]]
        self.image_size = image_size
        self.image_key = image_key

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx: int) -> np.ndarray:
        from .native import crop_resize_normalize

        img = self.ds[int(idx)][self.image_key]
        arr = np.asarray(img.convert("RGB"), np.uint8)
        out = crop_resize_normalize(arr, self.image_size)
        if out is None:
            import tempfile

            from .images import load_image

            with tempfile.NamedTemporaryFile(suffix=".png") as f:
                img.convert("RGB").save(f.name)
                return load_image(f.name, self.image_size)
        return out[None]


class LSUNDataset:
    """LSUN lmdb reader (reference LSUN/LSUNClass, utils.py:1576-1774),
    gated on the optional `lmdb` package."""

    def __init__(self, root: str, image_size: int):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "LSUN datasets need the `lmdb` package (not in this image); "
                "export the images to a folder and use ImgDataset instead"
            ) from e
        import io

        import lmdb
        from PIL import Image as PILImage

        self._Image = PILImage
        self._io = io
        self.env = lmdb.open(root, max_readers=1, readonly=True, lock=False,
                             readahead=False, meminit=False)
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
            self.keys = [k for k, _ in txn.cursor()]
        self.image_size = image_size

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> np.ndarray:
        from .native import crop_resize_normalize

        with self.env.begin(write=False) as txn:
            buf = txn.get(self.keys[idx])
        img = self._Image.open(self._io.BytesIO(buf)).convert("RGB")
        out = crop_resize_normalize(np.asarray(img, np.uint8), self.image_size)
        if out is not None:
            return out[None]
        # PIL fallback mirrors load_image: center-crop then bilinear resize
        w, h = img.size
        side = min(w, h)
        left, top = (w - side) // 2, (h - side) // 2
        img = img.crop((left, top, left + side, top + side))
        img = img.resize((self.image_size, self.image_size),
                         self._Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0 * 2 - 1
        return arr[None]


# built-in caption bank: offline stand-in for the reference's MS-COCO caption
# loader (utils.py:1779-1822 — broken as shipped: PROMPT_PATHS import is
# commented out). Real caption files plug in via the path argument.
_BUILTIN_CAPTIONS = [
    "a photo of a dog", "a photo of a cat", "a person smiling",
    "a red car on the street", "a mountain landscape at sunset",
    "a bowl of fruit on a table", "a city skyline at night",
    "a bird sitting on a branch", "a plate of pasta", "a child playing",
]


# shipped 50-caption COCO-style file: makes the reference's 50-prompt
# harvest (src/main.py:45-91) yield 50 DISTINCT bases offline instead of
# cycling the 10-caption builtin bank.
_SHIPPED_PROMPT_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "inputs", "prompts_coco50.txt",
)


def get_prompt_list(num_captions: int = 10, path: Optional[str] = None):
    """Reference get_ms_coco_prompt_list surface: first `num_captions`
    prompts from a local captions file (one per line / json list), the
    shipped `inputs/prompts_coco50.txt`, or the built-in 10-caption bank."""
    if not (path and os.path.exists(path)):
        path = _SHIPPED_PROMPT_FILE if os.path.exists(_SHIPPED_PROMPT_FILE) \
            else None
    if path:
        import json

        with open(path) as f:
            if path.endswith(".json"):
                caps = json.load(f)
            else:
                caps = [l.strip() for l in f if l.strip()]
        if caps:
            reps = (num_captions + len(caps) - 1) // len(caps)
            return (caps * reps)[:num_captions]
    reps = (num_captions + len(_BUILTIN_CAPTIONS) - 1) // len(_BUILTIN_CAPTIONS)
    return (_BUILTIN_CAPTIONS * reps)[:num_captions]
