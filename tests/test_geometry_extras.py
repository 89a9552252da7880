"""PCA variants and parallel transport."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_pullback_tpu.geometry.pca import (
    global_pca,
    local_pca,
    pca_to_x_direction,
)
from diffusion_pullback_tpu.geometry.transport import (
    transport_all,
    transport_direction,
)


def test_local_pca_linear_map_recovers_jacobian_svd():
    """For a linear map f(x)=xW, local PCA of f(x+σδ) must find the top left
    singular vectors of W (the pushforward of isotropic noise)."""
    key = jax.random.key(0)
    W = jax.random.normal(key, (12, 20))
    # give W a known dominant direction
    u, s, vt = jnp.linalg.svd(W, full_matrices=False)
    s = jnp.asarray([10.0, 5.0, 2.0] + [0.1] * 9)
    W = u @ jnp.diag(s) @ vt
    f = lambda x: x @ W
    x = jnp.zeros((1, 12))
    res = local_pca(f, x, jax.random.key(1), rank=3, num_samples=2048,
                    chunk=128, sigma=1.0)
    # components ≈ right singular vectors of the *output* covariance = rows of vt
    for i in range(2):
        c = abs(float(jnp.dot(res.components[i], vt[i])))
        assert c > 0.98, (i, c)
    # variances ≈ σ_i² (output covariance eigenvalues for isotropic input)
    np.testing.assert_allclose(
        np.asarray(res.variances[:2]), np.asarray(s[:2] ** 2), rtol=0.2
    )


def test_global_pca():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, 16)).astype(np.float32)
    dirs = np.linalg.qr(rng.normal(size=(16, 2)))[0].T.astype(np.float32)
    coef = rng.normal(size=(64, 2)).astype(np.float32) * np.array([5.0, 1.0], np.float32)
    hs = jnp.asarray(base + coef @ dirs + 0.01 * rng.normal(size=(64, 16)))
    res = global_pca(hs, rank=2)
    assert abs(float(jnp.dot(res.components[0], jnp.asarray(dirs[0])))) > 0.99
    assert float(res.variances[0]) > float(res.variances[1]) > 0


def test_pca_to_x_direction():
    W = jax.random.normal(jax.random.key(2), (6, 4))
    f = lambda x: x @ W
    x = jnp.zeros((1, 6))
    comp = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    v = pca_to_x_direction(f, x, comp)
    expect = W[:, 0] / jnp.linalg.norm(W[:, 0])
    np.testing.assert_allclose(np.asarray(v).ravel(), np.asarray(expect), atol=1e-5)


def test_transport_identity():
    """Transporting within the same basis returns the same direction."""
    rng = np.random.default_rng(1)
    u = np.linalg.qr(rng.normal(size=(32, 4)))[0].astype(np.float32)
    vT = np.linalg.qr(rng.normal(size=(24, 4)))[0].T.astype(np.float32)
    v = transport_direction(jnp.asarray(u), jnp.asarray(u), jnp.asarray(vT), 1)
    np.testing.assert_allclose(np.asarray(v), vT[1], atol=1e-5)
    vs = transport_all(jnp.asarray(u), jnp.asarray(u), jnp.asarray(vT))
    np.testing.assert_allclose(np.asarray(vs), vT, atol=1e-5)


def test_transport_rotated_basis():
    """u1 = u0·R (rotated h-basis) → transported coeffs undo the rotation."""
    rng = np.random.default_rng(2)
    u0 = np.linalg.qr(rng.normal(size=(32, 3)))[0].astype(np.float32)
    R = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    u1 = u0 @ R
    vT1 = np.linalg.qr(rng.normal(size=(24, 3)))[0].T.astype(np.float32)
    v = transport_direction(jnp.asarray(u0), jnp.asarray(u1), jnp.asarray(vT1), 0)
    expect = vT1.T @ (R.T @ np.eye(3)[:, 0])
    expect = expect / np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(v), expect, atol=1e-5)


def test_fourier_regularization_matches_numpy_reference():
    """Vectorised jnp implementation vs a direct per-channel numpy port of
    the reference's spectral-shaping formula."""
    from diffusion_pullback_tpu.ops.fourier import fourier_regularization

    rng = np.random.default_rng(0)
    src = rng.normal(size=(16, 16, 3)).astype(np.float32)
    pert = rng.normal(size=(16, 16, 3)).astype(np.float32)
    p, q = 1.0, 0.5

    def np_fft2(d):
        out = np.zeros(d.shape, np.complex128)
        for c in range(d.shape[2]):
            out[:, :, c] = np.fft.ifftshift(
                np.fft.fft2(np.fft.fftshift(d[:, :, c]), norm="ortho")
            )
        return out

    def np_ifft2(d):
        out = np.zeros(d.shape, np.complex128)
        for c in range(d.shape[2]):
            out[:, :, c] = np.fft.ifftshift(
                np.fft.ifft2(np.fft.fftshift(d[:, :, c]), norm="ortho")
            )
        return out

    sf = np_fft2(src)
    sd = np.abs(sf)
    phase = sf / sd
    pf = np_fft2(pert)
    shaped = np.abs(pf) ** p * sd**q * phase
    expect = np.real(np_ifft2(shaped))

    out = fourier_regularization(jnp.asarray(src), jnp.asarray(pert), p, q)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_fourier_smoothing_preserves_mean_scale():
    from diffusion_pullback_tpu.ops.fourier import fourier_regularization

    rng = np.random.default_rng(1)
    src = rng.normal(size=(8, 8, 3)).astype(np.float32)
    pert = rng.normal(size=(8, 8, 3)).astype(np.float32)
    out = fourier_regularization(jnp.asarray(src), jnp.asarray(pert), 1.0, 0.5,
                                 fft_smoothing=True)
    assert out.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_basis_comparison_acceptance():
    from diffusion_pullback_tpu.geometry.metrics import (
        compare_bases,
        passes_acceptance,
    )

    rng = np.random.default_rng(0)
    vT = np.linalg.qr(rng.normal(size=(24, 4)))[0].T
    s = np.asarray([10.0, 5.0, 2.01, 2.0])  # last two clustered
    # same subspace; clustered pair rotated + signs flipped
    R = np.eye(4)
    th = 0.7
    R[2:, 2:] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    vT2 = (R @ vT) * np.asarray([-1, 1, 1, -1])[:, None]
    cmp = compare_bases(vT2, s * 1.01, vT, s)
    assert passes_acceptance(cmp), cmp.per_direction_cos
    # a genuinely different direction fails
    vT3 = vT.copy()
    vT3[0] = np.linalg.qr(rng.normal(size=(24, 5)))[0].T[4]
    cmp_bad = compare_bases(vT3, s, vT, s)
    assert not passes_acceptance(cmp_bad)
