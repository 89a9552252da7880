"""Fourier noise shaping (spectral regularisation of perturbations).

TPU-native (jnp.fft, vectorised over channels/batch) equivalent of the
reference's `fourier_regularization` (src/models/ddpm/diffusion.py:713-778):
reshape a perturbation's spectrum toward the source image's spectral
envelope — |F(shaped)| = |F(perturbed)|^p · |F(src)|^q with the source's
phase — optionally variance-matching the magnitude field so low frequencies
don't dominate. (The reference's histogram-matching branch needs
scikit-image and is host-side; exposed separately.)
"""

from __future__ import annotations

import jax.numpy as jnp


def _fft2(x):
    """Orthonormal, center-shifted 2-D FFT over the leading two axes
    (reference _fft2 semantics), channels vectorised."""
    return jnp.fft.ifftshift(
        jnp.fft.fft2(jnp.fft.fftshift(x, axes=(0, 1)), axes=(0, 1), norm="ortho"),
        axes=(0, 1),
    )


def _ifft2(x):
    return jnp.fft.ifftshift(
        jnp.fft.ifft2(jnp.fft.fftshift(x, axes=(0, 1)), axes=(0, 1), norm="ortho"),
        axes=(0, 1),
    )


def fourier_regularization(
    src: jnp.ndarray,
    perturbed_src: jnp.ndarray,
    noise_p: float,
    noise_q: float,
    fft_smoothing: bool = False,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Shape ``perturbed_src``'s spectrum with ``src``'s envelope and phase.

    Inputs are (H, W, C) arrays (channel-last; the reference loops channels
    of HWC numpy — here one vectorised jnp.fft call).
    """
    src_fft = _fft2(src)
    src_dist = jnp.abs(src_fft)
    src_phase = src_fft / jnp.maximum(src_dist, eps)

    pert_fft = _fft2(perturbed_src)
    shaped_dist = jnp.abs(pert_fft) ** noise_p * src_dist**noise_q

    if fft_smoothing:
        var_src = src_dist - src_dist.mean()
        var_shaped = shaped_dist - shaped_dist.mean()
        shaped_dist = shaped_dist.mean() + var_shaped * (
            var_src.std() / jnp.maximum(var_shaped.std(), eps)
        )

    shaped = shaped_dist * src_phase
    return jnp.real(_ifft2(shaped))


def match_histograms(shaped: jnp.ndarray, src: jnp.ndarray):
    """Optional histogram matching (host-side; needs scikit-image)."""
    import numpy as np

    try:
        import skimage.exposure as exposure
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("histogram matching requires scikit-image") from e

    s = np.asarray(shaped, np.float64)
    s -= s.min()
    s /= max(s.max(), 1e-12)
    return exposure.match_histograms(s, np.asarray(src, np.float64),
                                     channel_axis=-1)
