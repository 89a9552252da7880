"""Pullback power-iteration tests against explicit Jacobian SVDs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.geometry import (
    local_pullback,
    pullback_covector,
)
from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny


def principal_angle_cosines(A, B):
    """Cosines of principal angles between the row spaces of A and B."""
    qa, _ = np.linalg.qr(np.asarray(A).T)
    qb, _ = np.linalg.qr(np.asarray(B).T)
    return np.linalg.svd(qa.T @ qb, compute_uv=False)


@pytest.fixture(scope="module")
def mlp():
    key = jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)
    W1 = jax.random.normal(k1, (24, 32)) / 5.0
    W2 = jax.random.normal(k2, (32, 16)) / 5.0

    def f(x):  # (1, 24) -> (1, 16), nonlinear
        return jnp.tanh(jnp.tanh(x @ W1) @ W2)

    x = jax.random.normal(k3, (1, 24))
    return f, x


def test_matches_explicit_svd(mlp):
    f, x = mlp
    J = jax.jacfwd(lambda z: f(z).ravel())(x).reshape(16, -1)  # (16, 24)
    _, s_true, vT_true = jnp.linalg.svd(J, full_matrices=False)

    r = 6
    res = local_pullback(f, x, jax.random.key(0), pca_rank=r,
                         min_iter=10, max_iter=100, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.s[:r]), np.asarray(s_true[:r]), rtol=1e-3)
    # per-direction alignment (σ are well separated for this random J)
    for i in range(3):
        c = abs(float(np.dot(np.asarray(res.vT[i]), np.asarray(vT_true[i]))))
        assert c > 0.999, (i, c)
    # u columns must be J v_k (norm σ_k)
    u_exp = J @ np.asarray(res.vT).T
    np.testing.assert_allclose(np.asarray(res.u), u_exp, atol=1e-4)


def test_chunked_equals_unchunked(mlp):
    f, x = mlp
    r1 = local_pullback(f, x, jax.random.key(1), pca_rank=6, max_iter=20, atol=1e-6)
    r2 = local_pullback(f, x, jax.random.key(1), pca_rank=6, max_iter=20,
                        atol=1e-6, chunk_size=2)
    np.testing.assert_allclose(np.asarray(r1.vT), np.asarray(r2.vT), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.s), np.asarray(r2.s), rtol=1e-5)


def test_jittable(mlp):
    f, x = mlp
    run = jax.jit(lambda z, k: local_pullback(f, z, k, pca_rank=4, max_iter=15))
    res = run(x, jax.random.key(2))
    assert res.vT.shape == (4, 24)
    assert int(res.iterations) >= 10


@pytest.mark.slow
def test_unet_encoder_pullback_top_subspace():
    """Top-3 pullback directions of a tiny U-Net mid-block encoder vs the
    explicitly assembled Jacobian."""
    cfg = ddpm_tiny(16)
    model = UNet2D(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)), jnp.float32)
    t = jnp.float32(400.0)
    params = model.init(jax.random.key(0), x, t)
    tap = TapPoint("mid", 0)
    f = lambda z: model.apply(params, z, t, tap, method=UNet2D.encode)

    J = jax.jacfwd(lambda z: f(z).ravel())(x).reshape(-1, x.size)  # (dim_h, 768)
    _, s_true, vT_true = np.linalg.svd(np.asarray(J), full_matrices=False)

    res = local_pullback(f, x, jax.random.key(3), pca_rank=8,
                         min_iter=10, max_iter=60, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.s[:3]), s_true[:3], rtol=1e-2)
    cos = principal_angle_cosines(np.asarray(res.vT[:3]), vT_true[:3])
    assert cos.min() > 0.99, cos


def test_pullback_covector_is_vjp(mlp):
    f, x = mlp
    u = jnp.ones((1, 16))
    v = pullback_covector(f, x, u)
    J = jax.jacfwd(lambda z: f(z).ravel())(x).reshape(16, -1)
    np.testing.assert_allclose(
        np.asarray(v).ravel(), np.asarray(J.T @ u.ravel()), atol=1e-5
    )


def test_qr_svd_recovers_ill_conditioned_spectrum():
    """QR-based SVD (default) holds accuracy over a 3-decade σ range where
    the Gram path's σ⁴ conditioning loses the tail (reference uses a full
    LAPACK SVD, utils.py:799 — this pins equivalent tail fidelity)."""
    rng = np.random.default_rng(0)
    d, k = 96, 8
    sig = np.array([10.0, 5.0, 1.0, 0.5, 0.1, 0.05, 0.02, 0.01], np.float32)
    qu, _ = np.linalg.qr(rng.normal(size=(d, d)).astype(np.float32))
    qv, _ = np.linalg.qr(rng.normal(size=(d, d)).astype(np.float32))
    u_true, v_true = qu[:, :k], qv[:, :k]
    jac = (u_true * sig) @ v_true.T

    fn = lambda x: (x.reshape(-1) @ jnp.asarray(jac.T)).reshape(1, -1)
    res = local_pullback(
        fn, jnp.zeros((1, d)), jax.random.key(1), pca_rank=k,
        min_iter=10, max_iter=60,
    )
    np.testing.assert_allclose(np.asarray(res.s), sig, rtol=1e-4)
    cos = np.abs(np.sum(np.asarray(res.vT) * v_true.T, axis=1))
    assert cos.min() > 0.999
    # earliest converged exit = min_iter + 2 completed iterations (the
    # reference's `i > min_iter` break, utils.py:806)
    assert int(res.iterations) == 12
    # gram fallback must degrade gracefully (no NaN), even if the tail is lost
    res_g = local_pullback(
        fn, jnp.zeros((1, d)), jax.random.key(1), pca_rank=k,
        min_iter=10, max_iter=30, svd_method="gram",
    )
    assert np.all(np.isfinite(np.asarray(res_g.s)))
    assert np.all(np.isfinite(np.asarray(res_g.vT)))


# ---- batched (fused multi-sample) pullback ----------------------------------


@pytest.fixture(scope="module")
def batched_mlp():
    """Per-sample-independent batch map: (B, 24) -> (B, 16)."""
    key = jax.random.key(11)
    k1, k2, k3 = jax.random.split(key, 3)
    W1 = jax.random.normal(k1, (24, 32)) / 5.0
    W2 = jax.random.normal(k2, (32, 16)) / 5.0

    def f(x):  # rows independent: the Jacobian is block-diagonal over B
        return jnp.tanh(jnp.tanh(x @ W1) @ W2)

    xs = jax.random.normal(k3, (3, 24))
    return f, xs


def test_batched_matches_per_sample(batched_mlp):
    """The fused program must reproduce per-sample local_pullback exactly
    (same probe init injected; fixed iterations)."""
    from diffusion_pullback_tpu.geometry import batched_local_pullback

    f, xs = batched_mlp
    B, r, iters = xs.shape[0], 5, 8
    v0 = jax.vmap(
        lambda k: jnp.linalg.qr(jax.random.normal(k, (24, r)))[0].T
    )(jax.random.split(jax.random.key(3), B))

    fused = batched_local_pullback(
        f, xs, jax.random.key(0), pca_rank=r,
        min_iter=iters, max_iter=iters, atol=0.0, v_init=v0)

    for b in range(B):
        single = local_pullback(
            lambda z: f(z), xs[b:b + 1], jax.random.key(0), pca_rank=r,
            min_iter=iters, max_iter=iters, atol=0.0, v_init=v0[b])
        np.testing.assert_allclose(
            np.asarray(fused.vT[b]), np.asarray(single.vT), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(fused.s[b]), np.asarray(single.s), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(fused.u[b]), np.asarray(single.u), atol=2e-5)


def test_batched_chunked_and_vjp_variants(batched_mlp):
    """chunk_size and fn_vjp paths agree with the plain fused program."""
    from diffusion_pullback_tpu.geometry import batched_local_pullback

    f, xs = batched_mlp
    r, iters = 4, 6
    kwargs = dict(pca_rank=r, min_iter=iters, max_iter=iters, atol=0.0)
    base = batched_local_pullback(f, xs, jax.random.key(5), **kwargs)
    chunked = batched_local_pullback(
        f, xs, jax.random.key(5), chunk_size=2, **kwargs)
    paired = batched_local_pullback(
        f, xs, jax.random.key(5), fn_vjp=f, **kwargs)
    for other in (chunked, paired):
        np.testing.assert_allclose(
            np.asarray(base.vT), np.asarray(other.vT), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(base.s), np.asarray(other.s), rtol=2e-5)


def test_batched_unet_per_sample_timesteps():
    """Fused pullback through the tiny U-Net with PER-SAMPLE timesteps
    matches per-sample runs (the config-2 sweep: samples x t-grid in one
    program, t riding the embedding batch axis)."""
    from diffusion_pullback_tpu.geometry import batched_local_pullback

    cfg = ddpm_tiny()
    model = UNet2D(cfg)
    B, r, iters = 2, 3, 6
    size = cfg.sample_size
    xs = jax.random.normal(jax.random.key(0), (B, size, size, 3))
    ts = jnp.asarray([100.0, 700.0], jnp.float32)
    params = model.init(jax.random.key(1), xs[:1], ts[:1])
    tap = TapPoint("mid", 0)

    dim_x = size * size * 3
    v0 = jax.vmap(
        lambda k: jnp.linalg.qr(jax.random.normal(k, (dim_x, r)))[0].T
    )(jax.random.split(jax.random.key(2), B))

    fused = batched_local_pullback(
        lambda z: model.apply(params, z, ts, tap, method=UNet2D.encode),
        xs, jax.random.key(3), pca_rank=r, min_iter=iters, max_iter=iters,
        atol=0.0, v_init=v0)

    for b in range(B):
        single = local_pullback(
            lambda z: model.apply(params, z, ts[b], tap, method=UNet2D.encode),
            xs[b:b + 1], jax.random.key(3), pca_rank=r,
            min_iter=iters, max_iter=iters, atol=0.0, v_init=v0[b])
        np.testing.assert_allclose(
            np.asarray(fused.s[b]), np.asarray(single.s), rtol=1e-4)
        for i in range(r):
            c = abs(float(np.dot(np.asarray(fused.vT[b, i]),
                                 np.asarray(single.vT[i]))))
            assert c > 1 - 1e-5, (b, i, c)
