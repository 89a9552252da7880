"""Analysis artifacts: eigenvalue spectra and vT direction visualisation.

Reference equivalents: the spectrum scatter (edit.py:249-251) and the RGB
visualisation of x-space directions via a 3-component PCA over channels
(edit.py:253-263 — torch.pca_lowrank + einsum + min/max normalise).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..utils.images import save_image_grid


def plot_eigenvalue_spectrum(s: np.ndarray, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = np.asarray(s)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(4, 3))
    ax.scatter(range(len(s)), s, s=4)
    ax.set_xlabel("index")
    ax.set_ylabel("singular value")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def visualize_vT_rgb(
    vT: np.ndarray, spatial_shape: Sequence[int], path: str
) -> np.ndarray:
    """Project each direction's channel axis onto its top-3 PCA components
    and save as an RGB grid. ``vT``: (k, H*W*C); ``spatial_shape``: (H, W, C).
    """
    h, w, c = spatial_shape
    k = vT.shape[0]
    maps = np.asarray(vT, np.float32).reshape(k, h, w, c)
    flat = maps.reshape(-1, c)
    flat = flat - flat.mean(axis=0, keepdims=True)
    # top-3 channel PCA (covariance is c×c — tiny)
    cov = flat.T @ flat
    _, evecs = np.linalg.eigh(cov)
    basis = evecs[:, ::-1][:, : min(3, c)]               # (c, 3)
    rgb = maps @ basis                                    # (k, h, w, ≤3)
    if rgb.shape[-1] < 3:
        rgb = np.concatenate(
            [rgb] + [rgb[..., :1]] * (3 - rgb.shape[-1]), axis=-1
        )
    rgb = rgb - rgb.min()
    rgb = rgb / max(rgb.max(), 1e-12)
    save_image_grid(rgb * 2 - 1, path, nrow=k)
    return rgb
