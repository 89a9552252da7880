"""x-space guidance: edit a latent along a pullback direction.

Reference semantics (edit.py:484-502 for SD, :1716-1734 uncond): each
micro-step evaluates ε on the pair [z, z + step·v_k] (one 2-batch U-Net
call) and moves z by scale·(ε_edit − ε_null) — a DDS-regularised walk along
the discovered direction. The reference loops this in Python collecting a
list (edit.py:293-301); here it is one `lax.scan` whose stacked ys ARE the
trajectory, and (pc, ±direction) pairs can be vmapped as a leading batch
axis instead of looped.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

EpsFn = Callable[[jax.Array, jax.Array], jax.Array]


def x_space_guidance_step(
    eps_fn: EpsFn,
    z: jax.Array,
    t: jax.Array,
    vk: jax.Array,
    edit_step: float,
    scale: float,
    pair_impl: str = "batch",
) -> jax.Array:
    """One micro-step. ``z``/``vk``: (B, H, W, C).

    ``pair_impl`` picks how the (ε_null, ε_edit) pair is evaluated —
    per-sample math is identical either way (GroupNorm/attention have no
    cross-batch coupling), so this is a pure scheduling choice:

    - ``'batch'``: one 2·B-row U-Net call, the reference's shape
      (edit.py:484-502). Wins when the model is weight-bandwidth-bound
      (small spatial dims, e.g. SD's 64×64 latent: 2-row eval ≈ 1.7× the
      1-row cost, amortizing the HBM weight reads).
    - ``'split'``: two B-row calls. Wins when a 2-row eval is padded to a
      larger conv batch tile: at CelebA-HQ-256 pixel space on a v5e chip the
      2-row eval measures 4.3× the 1-row cost (25.6 vs 5.9 ms, bf16 — probe
      scripts/probe_edit_decomp.py, 2026-08-20), so split halves the walk.
    """
    z_edit = z + edit_step * vk
    if pair_impl == "split":
        et_null = eps_fn(z, t)
        et_edit = eps_fn(z_edit, t)
    else:
        pair = jnp.concatenate([z, z_edit], axis=0)
        et = eps_fn(pair, t)
        et_null, et_edit = jnp.split(et, 2, axis=0)
    return z + scale * (et_edit - et_null)


def x_space_guidance_scan(
    eps_fn: EpsFn,
    z0: jax.Array,
    t: jax.Array,
    vk: jax.Array,
    num_steps: int,
    edit_step: float,
    scale: float,
    pair_impl: str = "batch",
) -> jax.Array:
    """Run ``num_steps`` micro-steps; returns the trajectory INCLUDING the
    starting latent: (num_steps + 1, B, H, W, C) — matching the reference's
    zt_list = [original, step_1, ..., step_N] (edit.py:293-301) so callers
    can subsample `traj[:: len // vis_num]` identically."""

    def body(z, _):
        z_next = x_space_guidance_step(eps_fn, z, t, vk, edit_step, scale,
                                       pair_impl=pair_impl)
        return z_next, z_next

    _, traj = jax.lax.scan(body, z0, None, length=num_steps)
    return jnp.concatenate([z0[None], traj], axis=0)


def x_space_guidance_scan_deepcache(
    full_fn: Callable[[jax.Array, jax.Array], tuple],
    reuse_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    z0: jax.Array,
    t: jax.Array,
    vk: jax.Array,
    num_steps: int,
    edit_step: float,
    scale: float,
    interval: int,
) -> jax.Array:
    """`x_space_guidance_scan` with DeepCache-style encoder reuse on the
    micro-steps themselves. Every micro-step evaluates ε on the SAME
    timestep t and the latent moves only by scale·Δε, so the deep U-Net
    path changes even more slowly than across sampling steps — the cache is
    refreshed every ``interval`` micro-steps and only the shallow slice +
    last up block recompute in between. interval=1 ≡ the exact walk.

    ``full_fn(pair, t) -> (eps, h)`` runs the full model and returns the
    ('up', n-2) tap activation; ``reuse_fn(pair, t, h) -> eps`` resumes from
    a cached h. Both consume the fused [z; z+δv] pair (2·B rows, reference
    edit.py:484-502 semantics)."""
    pair0 = jnp.concatenate([z0, z0], axis=0)
    h_shape = jax.eval_shape(full_fn, pair0, t)[1]

    def body(carry, i):
        z, h_cache = carry
        pair = jnp.concatenate([z, z + edit_step * vk], axis=0)

        def full(_):
            return full_fn(pair, t)

        def reuse(_):
            return reuse_fn(pair, t, h_cache), h_cache

        eps, h_new = jax.lax.cond(i % interval == 0, full, reuse, None)
        et_null, et_edit = jnp.split(eps, 2, axis=0)
        z_next = z + scale * (et_edit - et_null)
        return (z_next, h_new), z_next

    (_, _), traj = jax.lax.scan(
        body, (z0, jnp.zeros(h_shape.shape, h_shape.dtype)),
        jnp.arange(num_steps),
    )
    return jnp.concatenate([z0[None], traj], axis=0)


# ---- classifier guidance (ADM family) --------------------------------------
# Working TPU-native spec of the reference's vendored guided-sampling math
# (/root/reference/src/models/guided_diffusion/gaussian_diffusion.py:356-392):
# condition_mean (Sohl-Dickstein et al. 2015) shifts the DDPM posterior mean
# by Σ·∇ₓ log p(y|x); condition_score (Song et al. 2020) folds the gradient
# into ε, which is the form every DDIM step here consumes.


def classifier_grad_fn(
    logit_fn: Callable[[jax.Array, jax.Array], jax.Array],
    y: jax.Array,
    scale: float = 1.0,
):
    """cond_fn(x, t) = scale · ∇ₓ log softmax(classifier(x, t))[y] — the
    cond_fn the OpenAI sampling scripts build around EncoderUNetModel.
    ``y``: (B,) int labels; ``logit_fn(x, t)`` → (B, K) logits."""

    def cond_fn(x, t):
        yb = jnp.broadcast_to(jnp.asarray(y), (x.shape[0],))

        def log_prob(xx):
            logits = logit_fn(xx, t)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.take_along_axis(logp, yb[:, None], axis=-1).sum()

        return scale * jax.grad(log_prob)(x)

    return cond_fn


def condition_eps(eps: jax.Array, grad: jax.Array, abar_t) -> jax.Array:
    """condition_score in ε form (gaussian_diffusion.py:371-392):
    ε ← ε − √(1−ᾱ_t)·∇ₓ log p(y|x). Feeding the conditioned ε through
    `predict_x0` + the posterior mean reproduces the reference's
    pred_xstart/mean updates exactly (oracle-tested)."""
    return eps - jnp.sqrt(1.0 - abar_t) * grad


def condition_mean(mean: jax.Array, variance, grad: jax.Array) -> jax.Array:
    """condition_mean (gaussian_diffusion.py:356-369): μ ← μ + Σ·g, the
    DDPM-sampler (p_sample) conditioning strategy."""
    return mean + variance * grad


def guided_eps_fn(eps_fn: EpsFn, cond_fn, schedule) -> EpsFn:
    """Wrap an ε model with classifier guidance so any sampler loop here
    (ddim_forward / deepcache / scans) runs guided without modification —
    each eval computes ε(x,t) and the classifier gradient in one program."""
    from ..ops.schedule import alpha_bar

    def fn(x, t):
        return condition_eps(
            eps_fn(x, t), cond_fn(x, t), alpha_bar(schedule, t)
        )

    return fn
