"""Parallel transport of editing directions between samples.

The reference's run_edit_parallel_transport (edit.py:781-948) transports a
direction discovered at sample 0 to sample 1 through h-space:
v_k^(1) = v₁ᵀᵀ (u₁ᵀ u₀[:, k]) — express u₀'s k-th column in sample 1's
h-basis, then map back to sample 1's x-basis (SURVEY §2 B2; the shipped
code crashes on unset attrs — this is the working spec).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transport_direction(
    u0: jax.Array, u1: jax.Array, vT1: jax.Array, k: int
) -> jax.Array:
    """Transport direction k of basis-0 into x-space of sample 1.

    u0/u1: (dim_h, r) column bases; vT1: (r, dim_x) row basis of sample 1.
    Returns a unit (dim_x,) direction.
    """
    coeffs = u1.T @ u0[:, k]            # (r,) — u0_k in sample-1 h-basis
    v = vT1.T @ coeffs                  # (dim_x,)
    return v / jnp.linalg.norm(v)


def transport_all(u0: jax.Array, u1: jax.Array, vT1: jax.Array) -> jax.Array:
    """All directions at once → (r, dim_x) unit rows."""
    coeffs = u1.T @ u0                  # (r, r)
    v = coeffs.T @ vT1                  # (r, dim_x)
    return v / jnp.linalg.norm(v, axis=1, keepdims=True)
