"""Edited-latent regularizers — working specs of the reference's declared
post-edit xt regularization hooks.

The reference calls `self.dynamic_thresholding` / `self.preserve_contrast` /
`self.preserve_norm` on the edited latent batch right before the finish
sampling (edit.py:1192-1198, 1461-1467) and sparsifies parallel-transport
directions with a SEGA-style mask (edit.py:1213-1215) — but none of the four
methods is defined anywhere in the repo and their flags are commented out of
the argparser (define_argparser.py:58-66). These are the standard-literature
implementations, with the reference's commented defaults (q=0.8, σ=1.0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_sample(fn, x):
    flat = x.reshape(x.shape[0], -1)
    return fn(flat).reshape(x.shape)


def _ref_stat(stat: jax.Array, n_edit: int) -> jax.Array:
    """Align a per-reference-sample statistic (shape (B_ref,)) with the edit
    batch: identity when batches match, broadcast when the reference is a
    single latent; any other mismatch is a caller bug."""
    if stat.shape[0] == n_edit:
        return stat
    if stat.shape[0] == 1:
        return jnp.broadcast_to(stat, (n_edit,))
    raise ValueError(
        f"reference batch {stat.shape[0]} incompatible with edit batch {n_edit}"
    )


def preserve_norm(x_edit: jax.Array, x_ref: jax.Array) -> jax.Array:
    """Rescale each edited sample to its own reference latent's L2 norm
    (edits move along unit directions; this keeps ‖x_t‖ on the noise shell
    the sampler expects). A batch-1 reference broadcasts across the edit
    batch; otherwise matching is strictly per-sample."""
    ref = jnp.linalg.norm(x_ref.reshape(x_ref.shape[0], -1), axis=1)
    ref = _ref_stat(ref, x_edit.shape[0])

    def f(flat):
        n = jnp.linalg.norm(flat, axis=1, keepdims=True)
        return flat * (ref[:, None] / jnp.maximum(n, 1e-12))

    return _per_sample(f, x_edit)


def preserve_contrast(x_edit: jax.Array, x_ref: jax.Array) -> jax.Array:
    """Match each edited sample's (mean, std) to its own reference latent —
    the 'contrast' regularizer: edits may brighten/flatten the latent;
    re-standardizing suppresses global exposure drift. Batch-1 references
    broadcast; otherwise matching is per-sample."""
    rflat = x_ref.reshape(x_ref.shape[0], -1)
    r_mu = _ref_stat(rflat.mean(axis=1), x_edit.shape[0])
    r_sd = _ref_stat(rflat.std(axis=1), x_edit.shape[0])

    def f(flat):
        mu = flat.mean(axis=1, keepdims=True)
        sd = flat.std(axis=1, keepdims=True)
        return (flat - mu) * (r_sd[:, None] / jnp.maximum(sd, 1e-12)) + r_mu[:, None]

    return _per_sample(f, x_edit)


def dynamic_thresholding(x: jax.Array, q: float = 0.8) -> jax.Array:
    """Imagen-style dynamic thresholding: per-sample clamp at the q-quantile
    of |x| and rescale into [-s₀, s₀] where s₀ is the pre-edit clamp level
    implied by s at q (keeps the working range while killing outlier
    pixels/latents the edit pushed out)."""

    def f(flat):
        s = jnp.quantile(jnp.abs(flat), q, axis=1, keepdims=True)
        s = jnp.maximum(s, 1e-12)
        return jnp.clip(flat, -s, s)

    return _per_sample(f, x)


def sega_sparsify(v: jax.Array, sigma: float = 1.0) -> jax.Array:
    """SEGA-style direction sparsification (reference edit.py:1213-1215
    working spec): zero every component whose magnitude is below
    σ·std(v) — concentrates the edit on the salient coordinates."""
    std = v.std()
    return jnp.where(jnp.abs(v) < sigma * std, jnp.zeros_like(v), v)
