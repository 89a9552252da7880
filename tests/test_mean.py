"""Frechet / Hungarian mean-basis math."""

import jax.numpy as jnp
import numpy as np

from diffusion_pullback_tpu.geometry.mean import (
    frechet_mean_basis,
    hungarian_mean_basis,
)


def _orth(rng, d, r):
    return np.linalg.qr(rng.normal(size=(d, r)))[0].astype(np.float32)


def test_frechet_of_identical_bases_is_subspace():
    rng = np.random.default_rng(0)
    u = _orth(rng, 32, 3)
    m = np.asarray(frechet_mean_basis([jnp.asarray(u)] * 4, rank=3))
    # same subspace: projector distance ~ 0
    p1, p2 = u @ u.T, m @ m.T
    assert np.abs(p1 - p2).max() < 1e-4


def test_frechet_mean_of_rotated_bases():
    """Column-rotations within the same subspace must not change the mean."""
    rng = np.random.default_rng(1)
    u = _orth(rng, 32, 3)
    rots = [np.linalg.qr(rng.normal(size=(3, 3)))[0] for _ in range(3)]
    m = np.asarray(frechet_mean_basis([jnp.asarray(u @ R) for R in rots], 3))
    assert np.abs(u @ u.T - m @ m.T).max() < 1e-4


def test_hungarian_matches_permuted_columns():
    rng = np.random.default_rng(2)
    u = _orth(rng, 32, 4)
    perm = [2, 0, 3, 1]
    flip = np.asarray([1, -1, 1, -1], np.float32)
    u2 = u[:, perm] * flip[None, :]
    m = np.asarray(hungarian_mean_basis([jnp.asarray(u), jnp.asarray(u2)], 4))
    # matched+sign-fixed mean of {u, permuted/flipped u} is u itself (up to QR sign)
    cos = np.abs(u.T @ m)
    assert np.allclose(np.diag(cos), 1.0, atol=1e-4), np.diag(cos)
