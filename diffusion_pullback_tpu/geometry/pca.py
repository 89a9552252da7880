"""PCA variants over feature space.

Covers the reference's C4/C6 PCA surface:
  - `local_pca`  — PCA of h = f(x + δ) over many Gaussian perturbations
    (reference local_pca_zt, utils.py:900-975: 50k samples through
    torch.pca_lowrank, staged on a side device). Here it is a *streaming
    randomized sketch*: samples are generated and consumed in fixed-size
    vmapped chunks inside one jit (lax.fori accumulation), so 50k samples
    never materialise; memory is O(chunk · dim_h + dim_h · rank).
  - `global_pca` — PCA of h across a batch of different inputs
    (reference global_pca_zt, utils.py:978-1026).
  - `pca_to_x_direction` — map an h-space principal direction back to x via
    one VJP (the reference's inverse-Jacobian trick, utils.py:956-966 /
    inv_jac_zt:1117-1160).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .pullback import _short_fat_svd, pullback_covector


class PCAResult(NamedTuple):
    components: jax.Array   # (rank, dim_h) unit rows
    variances: jax.Array    # (rank,) explained variance (descending)
    mean: jax.Array         # (dim_h,)


def local_pca(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    key: jax.Array,
    rank: int = 50,
    num_samples: int = 4096,
    chunk: int = 64,
    sigma: float = 0.1,
    oversample: int = 8,
    unit_delta: bool = False,
) -> PCAResult:
    """Streaming randomized PCA of {f(x + σδ_i)} for Gaussian δ.

    ``unit_delta`` normalizes each perturbation to unit L2 norm before
    scaling by σ — the reference's text-space PCA perturbs prompt
    embeddings with normalize_wrt_batch'd noise (utils.py:1053).

    One pass accumulates mean and the sketch Y = Xᵀ Ω for a fixed Gaussian
    test matrix Ω (rank+oversample columns); a second tiny pass is avoided by
    centering the sketch with the accumulated mean (exact: (X-1μᵀ)ᵀΩ =
    XᵀΩ - μ (1ᵀΩ)). Top-``rank`` eigenpairs come from the QR/Gram of the
    centered sketch.
    """
    if num_samples % chunk:
        raise ValueError("num_samples must be divisible by chunk")
    h0 = fn(x)
    dim_h = h0.size
    q = rank + oversample
    n_chunks = num_samples // chunk

    # samples are regenerated deterministically per chunk index (fold_in), so
    # the two passes of the randomized SVD see identical data without ever
    # materialising the (num_samples, dim_h) matrix
    def chunk_samples(i):
        ks = jax.random.fold_in(key, i)
        delta = jax.random.normal(ks, (chunk,) + x.shape[1:], jnp.float32)
        if unit_delta:
            n = jnp.sqrt(jnp.sum(delta.reshape(chunk, -1) ** 2, axis=1))
            delta = delta / jnp.maximum(n, 1e-12).reshape(
                (chunk,) + (1,) * (delta.ndim - 1))
        return jax.vmap(lambda d: fn(x + sigma * d[None]).ravel())(delta)

    def omega_block(i):
        return jax.random.normal(
            jax.random.fold_in(jax.random.fold_in(key, 0x0FF5E7), i),
            (chunk, q), jnp.float32,
        )

    # pass 1: mean and sketch Y = Xᵀ Ω
    def body1(i, carry):
        sum_h, sketch, col_sums = carry
        hs = chunk_samples(i)                          # (chunk, dh)
        om = omega_block(i)                            # (chunk, q)
        return (
            sum_h + hs.sum(axis=0),
            sketch + hs.T @ om,
            col_sums + om.sum(axis=0),
        )

    sum_h, sketch, col_sums = jax.lax.fori_loop(
        0, n_chunks, body1,
        (
            jnp.zeros((dim_h,), jnp.float32),
            jnp.zeros((dim_h, q), jnp.float32),
            jnp.zeros((q,), jnp.float32),
        ),
    )
    mean = sum_h / num_samples
    # centered sketch: (X - 1μᵀ)ᵀ Ω = XᵀΩ − μ(1ᵀΩ)
    sketch_c = sketch - mean[:, None] * col_sums[None, :]
    qbasis, _ = jnp.linalg.qr(sketch_c)                # (dh, q) orthonormal

    # pass 2: B = Qᵀ (X − 1μᵀ)ᵀ, accumulated as Gram BBᵀ (q×q) — exact
    def body2(i, gram):
        hs = chunk_samples(i) - mean[None, :]          # (chunk, dh)
        proj = hs @ qbasis                             # (chunk, q)
        return gram + proj.T @ proj

    gram = jax.lax.fori_loop(
        0, n_chunks, body2, jnp.zeros((q, q), jnp.float32)
    )
    w, evecs = jnp.linalg.eigh(gram)                   # ascending
    w, evecs = w[::-1], evecs[:, ::-1]
    comps = (qbasis @ evecs[:, :rank]).T               # (rank, dh)
    comps = comps / jnp.linalg.norm(comps, axis=1, keepdims=True)
    return PCAResult(
        components=comps,
        variances=jnp.maximum(w[:rank], 0.0) / num_samples,
        mean=mean,
    )


def global_pca(hs: jax.Array, rank: int = 50) -> PCAResult:
    """PCA of a batch of feature maps (batch, ...) — reference global_pca_zt."""
    n = hs.shape[0]
    x = hs.reshape(n, -1).astype(jnp.float32)
    mean = x.mean(axis=0)
    xc = x - mean
    s, vt = _short_fat_svd(xc)
    k = min(rank, n)
    return PCAResult(
        components=vt[:k], variances=(s[:k] ** 2) / n, mean=mean
    )


def pca_to_x_direction(
    fn: Callable[[jax.Array], jax.Array], x: jax.Array, component: jax.Array
) -> jax.Array:
    """h-space principal direction → unit x-space direction via Jᵀ (the
    inverse-Jacobian trick)."""
    h_shape = jax.eval_shape(fn, x).shape  # shape only — no wasted forward
    v = pullback_covector(fn, x, component.reshape(h_shape))
    return v / jnp.linalg.norm(v)
