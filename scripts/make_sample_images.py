"""Generate the bundled sample images under datasets/.

The reference ships 5 CelebA-HQ photos + 6 example photos
(/root/reference/src/datasets/celeba_hq/0.jpg .., src/datasets/examples/)
so its published sweep scripts run out of the box. Those photos are not
redistributable here, so this repo bundles deterministic SYNTHETIC stand-ins
with the same filenames: procedurally drawn face-like compositions for
celeba_hq and varied structured scenes for examples. They exercise the same
code path (decode → center-crop → resize → normalize, utils/datasets.py) and
give the editing experiments real image structure to move.

Deterministic: seeded numpy only — re-running this script reproduces the
committed files bit-for-bit (same PIL/libjpeg version).

Usage: python scripts/make_sample_images.py [out_root]   (default: datasets/)
The dataset router also calls into this module as a last-resort fallback
when a known dataset folder is missing (utils/datasets.py get_dataset).
"""

from __future__ import annotations

import os
import sys

import numpy as np

SIZE = 512  # enough headroom for the 256px DDPM and 512px SD pipelines


def _grid(size=SIZE):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return x, y


def _blur(img: np.ndarray, k: int) -> np.ndarray:
    """Separable box blur (repeated 3x ~ Gaussian), reflect-padded."""
    if k <= 1:
        return img
    for axis in (0, 1):
        for _ in range(3):
            pad = [(0, 0)] * img.ndim
            pad[axis] = (k // 2, k - 1 - k // 2)
            p = np.pad(img, pad, mode="reflect")
            c = np.cumsum(p, axis=axis, dtype=np.float32)
            lead = [slice(None)] * img.ndim
            lag = [slice(None)] * img.ndim
            lead[axis] = slice(k, None)
            lag[axis] = slice(0, -k)
            first = [slice(None)] * img.ndim
            first[axis] = slice(k - 1, k)
            img = np.concatenate(
                [c[tuple(first)], c[tuple(lead)] - c[tuple(lag)]], axis=axis
            ) / k
    return img


def _ellipse(x, y, cx, cy, rx, ry, soft=0.01):
    d = ((x - cx) / rx) ** 2 + ((y - cy) / ry) ** 2
    return np.clip((1.0 - d) / soft, 0.0, 1.0)


def _over(base, mask, color):
    m = mask[..., None]
    return base * (1 - m) + np.asarray(color, np.float32) * m


def face(idx: int) -> np.ndarray:
    """A stylized face: gradient backdrop, hair, head, eyes, brows, nose,
    mouth — geometry/palette varied per index so the five samples span
    pose-ish and appearance-ish factors the pullback directions can find."""
    rng = np.random.default_rng(1000 + idx)
    x, y = _grid()
    img = np.zeros((SIZE, SIZE, 3), np.float32)

    # backdrop: two-corner gradient in a per-index hue
    c0 = rng.uniform(0.25, 0.75, 3)
    c1 = rng.uniform(0.25, 0.75, 3)
    img = c0 * (1 - y)[..., None] + c1 * y[..., None]
    img += 0.05 * np.sin(12 * np.pi * (x * rng.uniform(0.5, 1.5)))[..., None] * (
        rng.uniform(0, 1, 3)
    )

    cx = 0.5 + rng.uniform(-0.04, 0.04)
    cy = 0.52 + rng.uniform(-0.03, 0.03)
    head_rx = 0.23 + rng.uniform(-0.02, 0.04)
    head_ry = 0.30 + rng.uniform(-0.02, 0.04)
    skin = np.array([0.85, 0.68, 0.55]) * rng.uniform(0.75, 1.1)
    hair = rng.uniform(0.05, 0.45, 3) * np.array([1.0, 0.7, 0.5])

    # hair: larger ellipse behind/above the head, plus a fringe band
    img = _over(img, _ellipse(x, y, cx, cy - 0.06, head_rx * 1.35,
                              head_ry * 1.25, 0.03), hair)
    img = _over(img, _ellipse(x, y, cx, cy, head_rx, head_ry, 0.02), skin)
    fringe = _ellipse(x, y, cx, cy - head_ry * 0.72, head_rx * 0.98,
                      head_ry * 0.38, 0.05) * rng.uniform(0.6, 1.0)
    img = _over(img, fringe, hair)

    # eyes (white + iris + pupil), brows
    eye_dx = 0.085 + rng.uniform(-0.01, 0.015)
    eye_y = cy - 0.045 + rng.uniform(-0.01, 0.01)
    iris = rng.uniform(0.1, 0.6, 3) * np.array([0.6, 0.8, 1.0])
    for sgn in (-1, 1):
        ex = cx + sgn * eye_dx
        img = _over(img, _ellipse(x, y, ex, eye_y, 0.042, 0.022, 0.05),
                    [0.95, 0.95, 0.95])
        img = _over(img, _ellipse(x, y, ex, eye_y, 0.018, 0.018, 0.05), iris)
        img = _over(img, _ellipse(x, y, ex, eye_y, 0.007, 0.007, 0.1),
                    [0.05, 0.05, 0.05])
        img = _over(img, _ellipse(x, y, ex, eye_y - 0.045, 0.05, 0.008, 0.2),
                    hair * 0.7)

    # nose + mouth (smile curvature varies per index)
    img = _over(img, _ellipse(x, y, cx, cy + 0.04, 0.016, 0.05, 0.1),
                skin * 0.82)
    smile = rng.uniform(-0.5, 1.0)
    mouth_y = cy + 0.135 + 0.02 * smile * (((x - cx) / 0.08) ** 2 - 1)
    mouth = np.clip(
        (1 - ((x - cx) / (0.075 + 0.02 * rng.uniform(0, 1))) ** 2
         - ((y - mouth_y) / 0.022) ** 2) / 0.05, 0, 1)
    img = _over(img, mouth, [0.75, 0.25, 0.3])

    # shoulders
    img = _over(img, _ellipse(x, y, cx, 1.08, 0.42, 0.3, 0.02),
                rng.uniform(0.1, 0.8, 3))
    img = _blur(img, 3)
    img += rng.normal(0, 0.008, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def scene(idx: int) -> np.ndarray:
    """Varied structured scenes for datasets/examples: landscape, shapes,
    checker room, stripes+disc, concentric rings, blob creature."""
    rng = np.random.default_rng(2000 + idx)
    x, y = _grid()
    kind = idx % 6
    if kind == 0:  # landscape: sky gradient, sun, hills
        img = np.stack([0.4 + 0.3 * (1 - y), 0.6 + 0.2 * (1 - y),
                        0.9 - 0.2 * y], -1)
        img = _over(img, _ellipse(x, y, 0.72, 0.25, 0.09, 0.09, 0.04),
                    [1.0, 0.9, 0.4])
        for i, (h, c) in enumerate([(0.55, [0.25, 0.5, 0.2]),
                                    (0.68, [0.2, 0.42, 0.18]),
                                    (0.8, [0.15, 0.33, 0.15])]):
            ridge = h + 0.06 * np.sin((3 + i) * np.pi * x + i)
            img = _over(img, np.clip((y - ridge) / 0.01, 0, 1), c)
    elif kind == 1:  # floating shapes
        img = np.full((SIZE, SIZE, 3), 0.9, np.float32) * rng.uniform(
            0.7, 1.0, 3).astype(np.float32)
        for _ in range(7):
            cx, cy = rng.uniform(0.15, 0.85, 2)
            img = _over(img, _ellipse(x, y, cx, cy, rng.uniform(0.05, 0.18),
                                      rng.uniform(0.05, 0.18), 0.03),
                        rng.uniform(0, 1, 3))
    elif kind == 2:  # checker floor + back wall
        img = np.stack([0.6 + 0.2 * (1 - y)] * 3, -1)
        n = 8
        checker = ((np.floor(x * n) + np.floor((y - 0.5) * 2 * n)) % 2)
        floor = y > 0.55
        img[floor] = np.where(checker[floor, None] > 0, 0.85, 0.2)
        img = _over(img, _ellipse(x, y, 0.5, 0.45, 0.12, 0.22, 0.03),
                    [0.7, 0.2, 0.2])
    elif kind == 3:  # diagonal stripes + disc
        img = 0.5 + 0.4 * np.sin(14 * np.pi * (x + y))[..., None] * np.array(
            [1.0, 0.6, 0.3], np.float32)
        img = _over(img, _ellipse(x, y, 0.45, 0.5, 0.2, 0.2, 0.02),
                    [0.1, 0.3, 0.7])
    elif kind == 4:  # concentric rings
        r = np.hypot(x - 0.5, y - 0.5)
        img = 0.5 + 0.45 * np.cos(26 * np.pi * r)[..., None] * rng.uniform(
            0.4, 1.0, 3).astype(np.float32)
    else:  # blob creature on grass
        img = np.stack([0.3, 0.55, 0.3], -1) * np.ones((SIZE, SIZE, 3),
                                                       np.float32)
        img = _over(img, (y < 0.5).astype(np.float32), [0.55, 0.75, 0.95])
        img = _over(img, _ellipse(x, y, 0.5, 0.62, 0.2, 0.16, 0.03),
                    [0.6, 0.45, 0.3])
        img = _over(img, _ellipse(x, y, 0.5, 0.42, 0.12, 0.11, 0.03),
                    [0.65, 0.5, 0.35])
        for sgn in (-1, 1):
            img = _over(img, _ellipse(x, y, 0.5 + sgn * 0.05, 0.40, 0.02,
                                      0.02, 0.05), [0.05, 0.05, 0.05])
            img = _over(img, _ellipse(x, y, 0.5 + sgn * 0.1, 0.3, 0.03,
                                      0.06, 0.05), [0.6, 0.45, 0.3])
    img = _blur(img, 3)
    img = img + rng.normal(0, 0.008, img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


# filenames mirror the reference sets: 5 celeba jpgs, examples 0-1 png 2-5 jpg
CELEBA_FILES = [f"{i}.jpg" for i in range(5)]
EXAMPLE_FILES = ["0.png", "1.png", "2.jpg", "3.jpg", "4.jpg", "5.jpg"]


def generate(out_root: str, log=print) -> None:
    from PIL import Image

    made = []
    for sub, files, fn in (("celeba_hq", CELEBA_FILES, face),
                           ("examples", EXAMPLE_FILES, scene)):
        d = os.path.join(out_root, sub)
        os.makedirs(d, exist_ok=True)
        for i, name in enumerate(files):
            path = os.path.join(d, name)
            if os.path.exists(path):
                continue
            arr = (fn(i) * 255.0 + 0.5).astype(np.uint8)
            im = Image.fromarray(arr)
            if name.endswith(".jpg"):
                im.save(path, quality=92)
            else:
                im.save(path)
            made.append(path)
    if made:
        log(f"[datasets] generated {len(made)} synthetic sample images "
            f"under {out_root} (deterministic stand-ins for the reference's "
            "bundled photos; see scripts/make_sample_images.py)")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "datasets")
    generate(root)
