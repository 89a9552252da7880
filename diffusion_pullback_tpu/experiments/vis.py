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


def radial_psd(img: np.ndarray, num_bins: int = 64) -> np.ndarray:
    """Radially-averaged power spectral density of one (H, W, C) image:
    channel-mean |FFT2|² binned by distance from the DC component."""
    x = np.asarray(img, np.float32)
    if x.ndim == 2:
        x = x[..., None]
    h, w, _ = x.shape
    spec = np.fft.fftshift(np.fft.fft2(x, axes=(0, 1)), axes=(0, 1))
    power = (np.abs(spec) ** 2).mean(axis=-1)
    fy = np.arange(h) - h // 2
    fx = np.arange(w) - w // 2
    r = np.hypot(fy[:, None], fx[None, :])
    # integer-radius annuli (bin i = frequencies at distance ≈ i from DC),
    # capped at num_bins — keeps bin 1 = the fundamental for any image size
    bins = np.minimum(np.round(r).astype(np.int64), num_bins - 1)
    n = min(num_bins, int(np.round(r.max())) + 1)
    sums = np.bincount(bins.ravel(), weights=power.ravel(), minlength=n)[:n]
    counts = np.maximum(np.bincount(bins.ravel(), minlength=n)[:n], 1)
    return sums / counts


def vis_power_spectral_density(
    traj, path: str, num_bins: int = 64, labels=None
) -> np.ndarray:
    """Working spec of the reference's `vis_psd` path (edit.py:1702-1709
    calls an *undefined* vis_power_spectral_density — a NameError as
    shipped): one radially-averaged PSD curve per trajectory frame (x_t or
    ε_t over the DDIM grid), log-scale, colored early→late. Returns the
    (T, num_bins) PSD matrix."""
    frames = [np.asarray(f, np.float32) for f in traj]
    curves = np.stack(
        [radial_psd(f[0] if f.ndim == 4 else f, num_bins) for f in frames]
    )
    num_bins = curves.shape[1]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4))
    cmap = plt.get_cmap("viridis")
    t_count = len(curves)
    for i, c in enumerate(curves):
        ax.plot(
            np.arange(1, num_bins), c[1:],  # drop DC
            color=cmap(i / max(t_count - 1, 1)),
            label=(labels[i] if labels else None), linewidth=1.0,
        )
    ax.set_yscale("log")
    ax.set_xlabel("radial frequency bin")
    ax.set_ylabel("power")
    if labels:
        ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return curves
