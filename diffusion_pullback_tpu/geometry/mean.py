"""Global mean bases across samples: Frechet (Grassmannian) and Hungarian.

Working spec for the reference's run_edit_global_frechet_mean_zt /
run_edit_global_hungarian_mean_zt experiments (edit.py:950-1463), whose
`compute_frechet_basis` / `compute_hungarian_basis` helpers are referenced
but never defined (NameError as shipped — SURVEY §3).

  - Frechet: the extrinsic Grassmannian mean of the subspaces span(U_i) —
    top-r eigenvectors of the mean projector (1/n)Σ U_i U_iᵀ, computed via
    the Gram trick on the stacked (dim, n·r) matrix so the dim×dim projector
    never materialises.
  - Hungarian: match each basis' columns to a pivot basis by maximal
    |cosine| (scipy linear_sum_assignment), sign-align, average matched
    columns, re-orthonormalise (QR) — preserves per-direction identity
    where Frechet only preserves the subspace.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .pullback import _short_fat_svd


def frechet_mean_basis(bases: Sequence[jnp.ndarray], rank: int) -> jnp.ndarray:
    """bases: sequence of (dim, r) column-orthonormal matrices → (dim, rank).

    Top-``rank`` eigenvectors of (1/n)Σ U_iU_iᵀ = top left singular vectors
    of [U_1 … U_n]/√n.
    """
    stack = jnp.concatenate([jnp.asarray(u) for u in bases], axis=1)  # (d, nr)
    s, vT = _short_fat_svd(stack.T)  # svd of (nr, d): vT rows = left vecs of stack
    return vT[:rank].T


def hungarian_mean_basis(bases: Sequence[jnp.ndarray], rank: int) -> jnp.ndarray:
    """Column-matched mean basis → (dim, rank) column-orthonormal."""
    from scipy.optimize import linear_sum_assignment

    pivot = np.asarray(bases[0])[:, :rank]
    acc = pivot.copy()
    for u in bases[1:]:
        u = np.asarray(u)
        cos = pivot.T @ u  # (rank, r)
        row, col = linear_sum_assignment(-np.abs(cos))
        matched = u[:, col]
        signs = np.sign(np.sum(pivot * matched, axis=0))
        signs[signs == 0] = 1.0
        acc = acc + matched * signs[None, :]
    q, _ = np.linalg.qr(acc)
    return jnp.asarray(q[:, :rank])
